"""Configuration for the TPU-native DeepLight/DeepFwFM framework.

Mirrors every knob of the reference CLI (``/root/reference/utils/parameters.py:2-50``)
and the ``DeepFMs`` constructor (``/root/reference/model/DeepFMs.py:81-135``), but as
hashable frozen dataclasses so they can be closed over by ``jax.jit``-compiled
functions as static configuration.

Two layers of config:

* :class:`ModelConfig` — everything that determines the compiled compute graph
  (model family flags, architecture sizes, feature sizes, quantization mode, QR).
* :class:`TrainConfig` — the training-loop knobs (epochs, lr, pruning schedule, KD).
"""

from __future__ import annotations

import argparse
import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Tuple


@dataclass(frozen=True)
class ModelConfig:
    """Static model architecture config (hashable; safe as a jit static arg).

    Capability parity with ``DeepFMs.__init__`` (reference ``model/DeepFMs.py:81-135``):
    exactly one of ``use_logit / use_fm / use_ffm / use_fwfm`` may be set; ``use_deep``
    composes with any of them (DeepFM / DeepFFM / DeepFwFM) or stands alone.
    """

    field_size: int
    feature_sizes: Tuple[int, ...]
    numerical: int = 13  # first `numerical` fields are scalar-valued (Criteo: 13)
    embedding_size: int = 10

    # Model family flags (reference `use_logit/use_fm/use_ffm/use_fwfm/use_deep`)
    use_logit: bool = False
    use_fm: bool = False
    use_ffm: bool = False
    use_fwfm: bool = True
    use_deep: bool = True
    use_lw: bool = False     # linear weights on 1st-order term (fm_1st Linear)
    use_fwlw: bool = False   # FwFM linear weights derived from 2nd-order embeddings

    # Deep tower (reference `h_depth/deep_nodes/num_deeps`)
    h_depth: int = 3
    deep_nodes: int = 400
    num_deeps: int = 1

    # Dropout (reference dropout_shallow=[0,0], dropout_deep=[0.5]*(h_depth+1))
    dropout_shallow: Tuple[float, float] = (0.0, 0.0)
    dropout_deep: float = 0.5
    is_shallow_dropout: bool = True
    is_deep_dropout: bool = True

    # QR compositional embeddings (reference model/QREmbeddingBag.py + create_emb)
    qr_flag: bool = False
    qr_operation: str = "mult"   # mult | add | concat
    qr_collisions: int = 4
    qr_threshold: int = 200      # fields with feature_size > threshold use QR

    # Quantization mode (reference quantization.py driver + DeepFMs hooks)
    quantization_aware: bool = False
    static_quantization: bool = False
    dynamic_quantization: bool = False

    # Embedding-table storage dtype (TPU extension, VERDICT r3 #7): "bf16"
    # halves table + Adam-moment HBM bytes (gathered rows upcast to f32 for
    # the interaction/tower math; gradients cast back on the scatter).
    # MLP/R/bias stay f32.
    table_dtype: str = "f32"         # f32 | bf16

    n_class: int = 1

    def __post_init__(self):
        n_shallow = int(self.use_logit) + int(self.use_fm) + int(self.use_ffm) + int(self.use_fwfm)
        if n_shallow > 1:
            raise ValueError(
                "only one of use_logit/use_fm/use_ffm/use_fwfm may be set "
                "(reference model/DeepFMs.py:159-161)")
        if n_shallow == 0 and not self.use_deep:
            raise ValueError("choose at least one of (logit, fm, ffm, fwfm, deep)")
        if len(self.feature_sizes) != self.field_size:
            raise ValueError(
                f"feature_sizes has {len(self.feature_sizes)} entries, expected {self.field_size}")
        if self.qr_flag and self.qr_operation not in ("mult", "add", "concat"):
            raise ValueError(f"invalid qr_operation {self.qr_operation!r}")
        if self.table_dtype not in ("f32", "bf16"):
            raise ValueError(f"invalid table_dtype {self.table_dtype!r}")

    # ----- derived static properties ---------------------------------------

    @property
    def model_name(self) -> str:
        if self.use_logit:
            return "LR"
        shallow = "FM" if self.use_fm else "FFM" if self.use_ffm else "FwFM" if self.use_fwfm else ""
        if self.use_deep:
            return ("Deep" + shallow) if shallow else "DNN"
        return shallow

    @property
    def deep_layers(self) -> Tuple[int, ...]:
        return (self.deep_nodes,) * self.h_depth

    @property
    def num_categorical(self) -> int:
        return self.field_size - self.numerical

    @property
    def use_shallow(self) -> bool:
        return self.use_logit or self.use_fm or self.use_ffm or self.use_fwfm

    @property
    def needs_emb2(self) -> bool:
        """Whether the 2nd-order (dim-E) embedding table exists.

        Reference: fm/fwfm build it (model/DeepFMs.py:205-210); deep-only also
        builds it as the deep input (model/DeepFMs.py:250-256).
        """
        return self.use_fm or self.use_fwfm or (self.use_deep and not self.use_ffm)

    @property
    def needs_emb1(self) -> bool:
        """1st-order (dim-1) table exists unless fwlw replaces it (DeepFMs.py:197-202)."""
        return (self.use_logit or self.use_fm or self.use_fwfm) and not self.use_fwlw


@dataclass(frozen=True)
class TrainConfig:
    """Training-loop configuration (reference ``fit`` args + parser defaults)."""

    n_epochs: int = 8
    batch_size: int = 2048
    learning_rate: float = 1e-3
    momentum: float = 0.0
    optimizer_type: str = "adam"     # adam | sgd | rmsp | adag
    weight_decay: float = 3e-7       # L2, applied torch-style (added to grads)
    random_seed: int = 42
    loss_type: str = "logloss"

    # Pruning (reference fit(:647-674) + parser)
    prune: bool = False
    prune_fm: bool = True
    prune_deep: bool = True
    prune_r: bool = False
    sparse: float = 0.9              # target sparsity
    warm: float = 10                 # warm-up epochs before pruning starts
    emb_r: float = 1.0               # embedding sparsity ratio vs deep
    emb_corr: float = 1.0            # R-matrix sparsity ratio vs deep
    prune_interval: int = 10         # prune every N iterations (reference: i % 10 == 9)
    prune_deep_structured: bool = False  # TPU extension: prune whole DNN units
                                     # (column L2) so serving compaction yields
                                     # a smaller DENSE tower (MXU-friendly)
    prune_damping: float = 0.99      # adaptive schedule damping D (reference :649)
    prune_omega: float = 100.0       # adaptive schedule Ω (reference :649)

    # Knowledge distillation (reference loss_fn_kd, DeepFMs.py:1050-1064)
    kd: bool = False
    kd_alpha: float = 0.9
    kd_temperature: float = 20.0

    steps_per_call: int = 1          # K optimizer steps per device dispatch (lax.scan)
    table_layout: str = "super"      # super | flat — physical embedding-table
                                     # layout on single-device paths. "super"
                                     # packs 128//E rows per 128-lane line
                                     # (ops/superpack.py): ~12× less HBM for
                                     # E=10 tables and fast-path gathers at
                                     # full-Criteo scale; bit-identical fp32
                                     # semantics. Mesh-sharded runs use flat.
    eval_train_rows: int = 0         # cap rows for the per-epoch TRAIN-metric eval
                                     # (0 = full train set, the reference behavior
                                     # model/DeepFMs.py:681; a cap keeps epoch
                                     # telemetry cheap on multi-million-row runs)
    # Multi-chip mesh (TPU extension; the reference has no distribution story,
    # SURVEY §5.8). mesh_data=0 means "all remaining devices".
    mesh_data: int = 1               # data-parallel mesh axis size
    mesh_model: int = 1              # model-parallel axis (embedding row sharding)
    exchange: str = "a2a_grid"       # lookup exchange on multi-device meshes:
                                     # a2a_grid (tables over the full grid, no
                                     # table-grad all-reduce — default) |
                                     # a2a | psum (model-axis exchanges)
    mesh_table_layout: str = "flat"  # flat | super — shard-local table layout
                                     # on the a2a-family exchanges. "super"
                                     # packs each shard's rows into 128-lane
                                     # lines (the single-device train-step win
                                     # applied per shard); OPT-IN pending a
                                     # real multi-chip measurement (virtual-
                                     # mesh parity is tested; psum keeps flat
                                     # — its identity-transpose exchange
                                     # requires the plain-take gather).
    early_stopping: bool = False
    greater_is_better: bool = True
    eval_batch_size: int = 8192      # reference eval_by_batch (:760-763)
    verbose: bool = False
    save_model_path: Optional[str] = None
    checkpoint_backend: str = "npz"  # npz | orbax (async, multi-host writes)

    def adaptive_sparse(self, n_iter: int) -> float:
        """Adaptive pruning schedule s_t = S * (1 - D^(t/Ω)) (reference :649)."""
        return self.sparse * (1.0 - self.prune_damping ** (n_iter / self.prune_omega))


# ---------------------------------------------------------------------------
# argparse bridge — flag-for-flag parity with reference utils/parameters.py
# ---------------------------------------------------------------------------

def get_parser() -> argparse.ArgumentParser:
    """The reference CLI parser, flag for flag (``utils/parameters.py:2-50``).

    Dead reference flags (-use_multi, -ensemble, -gpu) are kept for CLI
    compatibility but are consumed by nothing, exactly as in the reference.
    """
    p = argparse.ArgumentParser(description="Hyperparameter tuning and selection (TPU-native)")
    p.add_argument("-c", default="DeepFwFM", type=str, help="Models: FM, DeepFwFM ...")
    p.add_argument("-use_cuda", default=0, type=int, help="Compat flag; TPU build ignores it")
    p.add_argument("-gpu", default=0, type=int, help="Dead flag (parity)")
    p.add_argument("-n_epochs", default=8, type=int)
    p.add_argument("-numerical", default=13, type=int, help="Numerical features, 13 for Criteo")
    p.add_argument("-use_multi", default=0, type=int, help="Dead flag (parity)")
    p.add_argument("-use_logit", default=0, type=int)
    p.add_argument("-use_fm", default=0, type=int)
    p.add_argument("-use_fwlw", default=0, type=int)
    p.add_argument("-use_lw", default=1, type=int)
    p.add_argument("-use_ffm", default=0, type=int)
    p.add_argument("-use_fwfm", default=1, type=int)
    p.add_argument("-use_deep", default=1, type=int)
    p.add_argument("-num_deeps", default=1, type=int)
    p.add_argument("-deep_nodes", default=400, type=int)
    p.add_argument("-h_depth", default=3, type=int)
    p.add_argument("-prune", default=0, type=int)
    p.add_argument("-prune_r", default=0, type=int)
    p.add_argument("-prune_deep", default=1, type=int)
    p.add_argument("-prune_deep_structured", default=0, type=int,
                   help="Prune whole DNN units instead of elements (TPU "
                        "extension; enables serve-time tower compaction)")
    p.add_argument("-prune_fm", default=1, type=int)
    p.add_argument("-emb_r", default=1.0, type=float)
    p.add_argument("-emb_corr", default=1.0, type=float)
    p.add_argument("-sparse", default=0.9, type=float)
    p.add_argument("-warm", default=10, type=float)
    p.add_argument("-ensemble", default=0, type=int, help="Dead flag (parity)")
    p.add_argument("-embedding_size", default=10, type=int)
    p.add_argument("-batch_size", default=2048, type=int)
    p.add_argument("-random_seed", default=42, type=int)
    p.add_argument("-learning_rate", default=0.001, type=float)
    p.add_argument("-momentum", default=0, type=float)
    p.add_argument("-l2", default=3e-7, type=float)
    p.add_argument("-dataset", default="criteo", type=str,
                   choices=["criteo", "tiny-criteo", "twitter", "ali", "avazu"])
    p.add_argument("-save_model_path", default=0, type=str)
    p.add_argument("-dynamic_quantization", default=0, type=int)
    p.add_argument("-static_quantization", default=0, type=int)
    p.add_argument("-quantization_aware", default=0, type=int)
    p.add_argument("-kd", default=0, type=int)
    p.add_argument("-loss_type", default="logloss", type=str)
    p.add_argument("-emb_bag", default=0, type=int,
                   help="Compat flag; packed tables always behave like EmbeddingBag")
    p.add_argument("-qr_emb", default=0, type=int)
    p.add_argument("-qr_operation", default="mult", type=str)
    p.add_argument("-qr_collisions", default=4, type=int)
    p.add_argument("-qr_threshold", default=200, type=int)
    p.add_argument("-twitter_category", default="like", type=str,
                   choices=["reply", "retweet", "retweet_comment", "like"])
    p.add_argument("-time_on_cuda", default=0, type=int, help="Compat flag")
    # TPU-native extensions
    p.add_argument("-prune_omega", default=100.0, type=float,
                   help="Adaptive-schedule Omega (TPU extension; reference hardcodes 100)")
    p.add_argument("-steps_per_call", default=1, type=int,
                   help="Optimizer steps per device dispatch (TPU extension)")
    p.add_argument("-table_dtype", default="f32", type=str,
                   choices=["f32", "bf16"],
                   help="Embedding-table storage dtype (TPU extension; bf16 "
                        "halves table+moment bytes)")
    p.add_argument("-table_layout", default="super", type=str,
                   choices=["super", "flat"],
                   help="Embedding-table physical layout (TPU extension; "
                        "'super' packs rows into 128-lane lines)")
    p.add_argument("-mesh_data", default=1, type=int,
                   help="Data-parallel mesh axis size (1 = no data sharding, 0 = all remaining devices)")
    p.add_argument("-mesh_model", default=1, type=int,
                   help="Model-parallel mesh axis size (embedding row sharding)")
    p.add_argument("-exchange", default="a2a_grid", type=str,
                   choices=["a2a_grid", "a2a", "psum"],
                   help="Sharded embedding-lookup exchange (a2a_grid applies on "
                        "any multi-device mesh; a2a/psum need -mesh_model > 1)")
    p.add_argument("-mesh_table_layout", default="flat", type=str,
                   choices=["flat", "super"],
                   help="Shard-local table layout for a2a-family exchanges "
                        "(TPU extension; 'super' = 128-lane packed lines per "
                        "shard, opt-in)")
    p.add_argument("-eval_train_rows", default=0, type=int,
                   help="Cap rows for the per-epoch train-metric eval "
                        "(TPU extension; 0 = full train set, reference behavior)")
    p.add_argument("-auto_resume", default=0, type=int,
                   help="Max automatic restarts of fit after a transient "
                        "device/runtime failure, resuming from the per-epoch "
                        "checkpoint (TPU extension; SURVEY §5.3 — the "
                        "reference has no failure handling)")
    p.add_argument("-debug_nans", default=0, type=int,
                   help="Trap NaN/Inf from any jitted computation during fit "
                        "(TPU extension; jax_debug_nans via utils/debug.py — "
                        "the reference has no sanitizers, SURVEY §5.2)")
    return p


def configs_from_args(pars, field_size: int, feature_sizes) -> Tuple[ModelConfig, TrainConfig]:
    """Build (ModelConfig, TrainConfig) from parsed CLI flags + dataset shape.

    Mirrors the single flags→constructor mapping ``get_model``
    (reference ``utils/util.py:58-73``).
    """
    mcfg = ModelConfig(
        field_size=field_size,
        feature_sizes=tuple(int(s) for s in feature_sizes),
        numerical=pars.numerical,
        embedding_size=pars.embedding_size,
        use_logit=bool(pars.use_logit),
        use_fm=bool(pars.use_fm),
        use_ffm=bool(pars.use_ffm),
        use_fwfm=bool(pars.use_fwfm),
        use_deep=bool(pars.use_deep),
        use_lw=bool(pars.use_lw),
        use_fwlw=bool(pars.use_fwlw),
        h_depth=pars.h_depth,
        deep_nodes=pars.deep_nodes,
        num_deeps=pars.num_deeps,
        qr_flag=bool(pars.qr_emb),
        qr_operation=pars.qr_operation,
        qr_collisions=pars.qr_collisions,
        qr_threshold=pars.qr_threshold,
        quantization_aware=bool(pars.quantization_aware),
        static_quantization=bool(pars.static_quantization),
        dynamic_quantization=bool(pars.dynamic_quantization),
        table_dtype=getattr(pars, "table_dtype", "f32"),
    )
    tcfg = TrainConfig(
        n_epochs=pars.n_epochs,
        batch_size=pars.batch_size,
        learning_rate=pars.learning_rate,
        momentum=pars.momentum,
        weight_decay=pars.l2,
        random_seed=pars.random_seed,
        loss_type=pars.loss_type,
        prune=bool(pars.prune),
        prune_fm=bool(pars.prune_fm),
        prune_deep=bool(pars.prune_deep),
        prune_deep_structured=bool(getattr(pars, "prune_deep_structured", 0)),
        prune_r=bool(pars.prune_r),
        sparse=pars.sparse,
        warm=pars.warm,
        emb_r=pars.emb_r,
        emb_corr=pars.emb_corr,
        kd=bool(pars.kd),
        prune_omega=getattr(pars, "prune_omega", 100.0),
        steps_per_call=getattr(pars, "steps_per_call", 1),
        table_layout=getattr(pars, "table_layout", "super"),
        mesh_data=getattr(pars, "mesh_data", 1),
        mesh_model=getattr(pars, "mesh_model", 1),
        exchange=getattr(pars, "exchange", "a2a_grid"),
        mesh_table_layout=getattr(pars, "mesh_table_layout", "flat"),
        eval_train_rows=getattr(pars, "eval_train_rows", 0),
        save_model_path=(pars.save_model_path if pars.save_model_path not in (0, "0") else None),
    )
    return mcfg, tcfg
