#!/usr/bin/env python
"""Golden parity check: run the REFERENCE torch implementation and this
framework on identical tiny-criteo data/config, and compare metric
trajectories.

The reference is executed in-place from ``/root/reference`` (read-only) via a
scratch working directory holding symlinks to its sources plus the regenerated
``data/category_emb`` feature map (missing from the snapshot — see
``.MISSING_LARGE_BLOBS``). Nothing is copied into this repository.

Initialization RNGs differ across frameworks, so metrics are compared as
distributions, not bit-exact: after N identical epochs both implementations
should land within a tolerance band on train/valid logloss + AUC.

Usage: python scripts/compare_with_reference.py [--epochs 2] [--rows 10000]

At-scale mode (round 4, VERDICT r3 #2): ``--synthetic-rows 200000`` swaps the
10k-row tiny-criteo substrate (AUC ~0.69 regime) for the synthetic generator's
planted-model data (:func:`scripts.synthetic_scale_run.make_synthetic`) at a
row count where the 0.78+ AUC regime is reachable, runs BOTH frameworks on the
identical arrays (written to an npz the reference runner loads), and applies
the tighter ±0.005 ΔAUC parity band. The data seed is fixed (independent of
the model seeds) so every seed trains on the same rows.
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REFERENCE = "/root/reference"

REF_RUNNER = r'''
import json, sys, os
import numpy as np, random, torch
sys.path.insert(0, {ref!r})
os.chdir({workdir!r})
torch.set_num_threads(4)

np.random.seed({seed}); random.seed({seed}); torch.manual_seed({seed})

from utils import data_preprocess
from model import DeepFMs
import logging, re
logging.basicConfig(level=logging.INFO)
logger = logging.getLogger("ref")

# capture the reference's per-epoch "Validation [N] loss: L metric: A" lines
# (DeepFMs.py:691-695) so the caller can compare full trajectories, not just
# the final metric (round-4 NOTES #5: pin the post-peak divergence per epoch)
class _TrajHandler(logging.Handler):
    # Validation line format (DeepFMs.py:691-695) — the sparse tail group is
    # optional so dense-era logs without it still parse
    pat = re.compile(r"Validation \[(\d+)\] loss: ([\d.]+) metric: ([\d.]+)"
                     r"(?:.*?sparse ([\d.]+)%)?")
    def __init__(self):
        super().__init__(); self.rows = []
    def emit(self, record):
        m = self.pat.search(record.getMessage())
        if m:
            row = {{"epoch": int(m.group(1)),
                   "loss": float(m.group(2)),
                   "auc": float(m.group(3))}}
            if m.group(4) is not None:
                row["sparsity"] = float(m.group(4))
            self.rows.append(row)
_traj = _TrajHandler()
logger.addHandler(_traj)

synth = {synth!r}
if synth:
    d = np.load(synth)
    sizes = [int(s) for s in d['sizes']]
    train = {{'label': d['ytr'], 'index': d['xitr'], 'value': d['xvtr'],
              'feature_sizes': sizes}}
    test = {{'label': d['yte'], 'index': d['xite'], 'value': d['xvte'],
             'feature_sizes': sizes}}
else:
    num_set = set(range(1, 14))
    train = data_preprocess.read_data('./data/tiny_train_input.csv', './data/category_emb', num_set, feature_dim_start=0, dim=39)
    test = data_preprocess.read_data('./data/tiny_test_input.csv', './data/category_emb', num_set, feature_dim_start=0, dim=39)
rows = {rows}
for k in ('label','index','value'):
    train[k] = train[k][:rows]

if {model!r} == "nfm":
    # the reference's standalone NFM estimator (NFM.py:66-106,281-463).
    # Its module bottom runs an unguarded training script against missing
    # ./data/large files (NFM.py:561-575) — exec only the definitions above
    # the "test part" marker.
    import types
    src = open(os.path.join({ref!r}, "NFM.py")).read()
    cut = src.find('"""\n    test part')
    NFMmod = types.ModuleType("NFM_ref")
    exec(compile(src[:cut], "NFM.py", "exec"), NFMmod.__dict__)
    model = NFMmod.NFM(field_size=39, feature_sizes=train['feature_sizes'],
        embedding_size={emb}, n_epochs={epochs}, verbose=False, use_cuda=False,
        use_fm=True, use_ffm=False, interation_type=True, batch_size={batch},
        learning_rate={lr}, weight_decay=3e-7, h_depth={depth},
        deep_layers=[{nodes}] * {depth}, random_seed={seed}, num=13)
    model.fit(train['index'], train['value'], train['label'],
              test['index'], test['value'], test['label'], early_stopping=False)
    loss, auc = model.eval_by_batch(
        np.array(test['index']).reshape((-1, 26, 1)), np.array(test['value']),
        np.array(test['label']), len(test['label']))
    print("REFJSON " + json.dumps({{"loss": loss, "auc": auc}}))
    raise SystemExit(0)

FLAGS = {{
    "deepfwfm": dict(use_fm=False, use_fwfm=True, use_deep=True, use_lw=True, use_fwlw=True, use_logit=0),
    "fwfm":     dict(use_fm=False, use_fwfm=True, use_deep=False, use_lw=True, use_fwlw=False, use_logit=0),
    "fm":       dict(use_fm=True, use_fwfm=False, use_deep=False, use_lw=True, use_fwlw=False, use_logit=0),
    "lr":       dict(use_fm=False, use_fwfm=False, use_deep=False, use_lw=False, use_fwlw=False, use_logit=1),
}}[{model!r}]
model = DeepFMs.DeepFMs(field_size=39, feature_sizes=train['feature_sizes'],
    embedding_size={emb}, n_epochs={epochs}, verbose=False, use_cuda=False,
    use_ffm=False, batch_size={batch}, learning_rate={lr},
    weight_decay=3e-7, momentum=0, sparse={sparse}, warm={warm}, h_depth={depth},
    deep_nodes={nodes}, num_deeps=1, numerical=13, random_seed={seed}, logger=logger,
    **FLAGS)
# pruned arm (VERDICT r4 #2): the reference's in-loop DeepLight pruning
# (DeepFMs.py:647-674) — every 10 iters past warm, 3 groups, Omega=100
model.fit(train['index'], train['value'], train['label'],
          test['index'], test['value'], test['label'], early_stopping=False,
          save_path=None, prune={prune}, prune_fm={prune}, prune_r={prune},
          prune_deep={prune}, emb_r={emb_r}, emb_corr={emb_corr})
loss, auc, prauc, rce = model.eval_by_batch(
    np.array(test['index']).reshape((-1, 26, 1)), np.array(test['value']),
    np.array(test['label']), len(test['label']))
print("REFJSON " + json.dumps({{"loss": loss, "auc": auc, "prauc": prauc, "rce": rce,
                                "trajectory": _traj.rows}}))
'''


def run_reference(workdir, epochs, rows, emb, nodes, depth, batch,
                  model="deepfwfm", seed=42, lr=1e-3, synth=None,
                  prune=0, sparse=0.9, warm=10, emb_r=0.444, emb_corr=1.0):
    os.makedirs(os.path.join(workdir, "data"), exist_ok=True)
    if synth is None:
        for f in ("tiny_train_input.csv", "tiny_test_input.csv"):
            dst = os.path.join(workdir, "data", f)
            if not os.path.exists(dst):
                os.symlink(os.path.join(REFERENCE, "data", f), dst)
        # regenerate the missing feature map compatible with the reference reader
        from xsdeepfwfm_deprecated_tpu.data.feature_map import (
            derive_feature_sizes_from_csv, write_feature_map_stub)
        sizes = derive_feature_sizes_from_csv(
            [os.path.join(REFERENCE, "data", "tiny_train_input.csv"),
             os.path.join(REFERENCE, "data", "tiny_test_input.csv")], 13)
        write_feature_map_stub(os.path.join(workdir, "data", "category_emb"), sizes, 13)

    code = REF_RUNNER.format(ref=REFERENCE, workdir=workdir, rows=rows,
                             epochs=epochs, emb=emb, nodes=nodes, depth=depth,
                             batch=batch, model=model, seed=seed, lr=lr,
                             synth=synth, prune=int(prune), sparse=sparse,
                             warm=int(warm), emb_r=emb_r, emb_corr=emb_corr)
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=4 * 3600,
                         env={**os.environ, "JAX_PLATFORMS": "cpu"})
    for line in out.stdout.splitlines():
        if line.startswith("REFJSON "):
            return json.loads(line[len("REFJSON "):])
    sys.stderr.write(out.stdout[-3000:] + "\n" + out.stderr[-3000:])
    raise RuntimeError("reference run produced no result")


def run_ours(epochs, rows, emb, nodes, depth, batch, model="deepfwfm", seed=42,
             lr=1e-3, data=None, prune=0, sparse=0.9, warm=10, emb_r=0.444,
             emb_corr=1.0):
    import jax
    jax.config.update("jax_platforms", "cpu")
    from xsdeepfwfm_deprecated_tpu.config import ModelConfig, TrainConfig
    from xsdeepfwfm_deprecated_tpu.data import get_dataset
    from xsdeepfwfm_deprecated_tpu.train.trainer import DeepFMEstimator

    if data is not None:
        train, test = data
    else:
        field_size, train, valid, test = get_dataset("tiny-criteo")
    if model == "nfm":
        from xsdeepfwfm_deprecated_tpu.models.nfm import NFMConfig, NFMEstimator
        mcfg = NFMConfig(field_size=39,
                         feature_sizes=tuple(train["feature_sizes"]),
                         numerical=13, embedding_size=emb, h_depth=depth,
                         deep_nodes=nodes, use_fm=True, interaction_type=True)
        tcfg = TrainConfig(n_epochs=epochs, batch_size=batch, learning_rate=lr,
                           weight_decay=3e-7, random_seed=seed)
        est = NFMEstimator(mcfg, tcfg)
        est.fit(train["index"][:rows], train["value"][:rows], train["label"][:rows],
                test["index"], test["value"], test["label"])
        loss, auc, prauc, rce = est.eval_by_batch(test["index"], test["value"],
                                                  test["label"])
        return {"loss": loss, "auc": auc, "prauc": prauc, "rce": rce}
    flags = {
        "deepfwfm": dict(use_fwfm=True, use_deep=True, use_lw=True, use_fwlw=True),
        "fwfm": dict(use_fwfm=True, use_deep=False, use_lw=True),
        "fm": dict(use_fm=True, use_fwfm=False, use_deep=False, use_lw=True),
        "lr": dict(use_logit=True, use_fwfm=False, use_deep=False),
    }[model]
    base = dict(use_logit=False, use_fm=False, use_ffm=False, use_fwfm=False,
                use_deep=False, use_lw=False, use_fwlw=False)
    base.update(flags)
    mcfg = ModelConfig(field_size=39, feature_sizes=tuple(train["feature_sizes"]),
                       numerical=13, embedding_size=emb, h_depth=depth,
                       deep_nodes=nodes, **base)
    # steps_per_call=1 for the pruned golden: the K=1 path fires the prune
    # refresh at exactly the reference's points (i%10==9 and the last batch)
    tcfg = TrainConfig(n_epochs=epochs, batch_size=batch, learning_rate=lr,
                       weight_decay=3e-7, random_seed=seed, sparse=sparse,
                       warm=int(warm))
    est = DeepFMEstimator(mcfg, tcfg)
    est.fit(train["index"][:rows], train["value"][:rows], train["label"][:rows],
            test["index"], test["value"], test["label"],
            prune=bool(prune), prune_fm=bool(prune), prune_r=bool(prune),
            prune_deep=bool(prune), emb_r=emb_r, emb_corr=emb_corr)
    loss, auc, prauc, rce = est.eval_by_batch(test["index"], test["value"],
                                              test["label"])
    traj = [{"epoch": i + 1, "auc": float(a)}
            for i, a in enumerate(est.valid_result)]
    for i, s in enumerate(getattr(est, "epoch_sparsity", [])[:len(traj)]):
        traj[i]["sparsity"] = float(s)
    return {"loss": loss, "auc": auc, "prauc": prauc, "rce": rce,
            "trajectory": traj}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--rows", type=int, default=10000)
    ap.add_argument("--emb", type=int, default=10)
    ap.add_argument("--nodes", type=int, default=400)
    ap.add_argument("--depth", type=int, default=3)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--model", choices=["deepfwfm", "fwfm", "fm", "lr", "nfm"],
                    default="deepfwfm")
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--seeds", default="42",
                    help="comma-separated seed list; >1 seed reports mean±std")
    ap.add_argument("--synthetic-rows", type=int, default=0,
                    help="at-scale mode: train on N synthetic planted-model "
                         "rows instead of tiny-criteo (VERDICT r3 #2)")
    ap.add_argument("--synthetic-test", type=int, default=50000)
    ap.add_argument("--data-seed", type=int, default=0)
    ap.add_argument("--prune", action="store_true",
                    help="pruned head-to-head (VERDICT r4 #2): both frameworks "
                         "run the in-loop DeepLight D-90/R-90/F-40 recipe "
                         "(Omega=100 — the reference hardcodes it)")
    ap.add_argument("--sparse", type=float, default=0.9)
    ap.add_argument("--warm", type=int, default=1)
    ap.add_argument("--emb-r", type=float, default=0.444)
    ap.add_argument("--emb-corr", type=float, default=1.0)
    args = ap.parse_args()
    seeds = [int(s) for s in args.seeds.split(",")]

    synth_npz, data = None, None
    synth_dir = None
    if args.synthetic_rows:
        from synthetic_scale_run import make_synthetic
        n = args.synthetic_rows + args.synthetic_test
        xi, xv, y, sizes, logit, _ = make_synthetic(n, seed=args.data_seed)
        tr = slice(0, args.synthetic_rows)
        te = slice(args.synthetic_rows, n)
        synth_dir = tempfile.mkdtemp(prefix="golden_synth_")
        synth_npz = os.path.join(synth_dir, "synth.npz")
        np.savez(synth_npz, xitr=xi[tr], xvtr=xv[tr], ytr=y[tr],
                 xite=xi[te], xvte=xv[te], yte=y[te],
                 sizes=np.asarray(sizes, np.int64))
        train_d = {"index": xi[tr], "value": xv[tr], "label": y[tr],
                   "feature_sizes": list(sizes)}
        test_d = {"index": xi[te], "value": xv[te], "label": y[te],
                  "feature_sizes": list(sizes)}
        data = (train_d, test_d)
        args.rows = args.synthetic_rows
        from synthetic_scale_run import oracle_auc
        print(f"synthetic data: {args.synthetic_rows} train / "
              f"{args.synthetic_test} test rows, {sum(sizes):,} features, "
              f"oracle test AUC {oracle_auc(logit[te], y[te]):.4f}")

    prune_kw = dict(prune=int(args.prune), sparse=args.sparse, warm=args.warm,
                    emb_r=args.emb_r, emb_corr=args.emb_corr)
    ours_runs, ref_runs = [], []
    for seed in seeds:
        ours = run_ours(args.epochs, args.rows, args.emb, args.nodes,
                        args.depth, args.batch, args.model, seed, args.lr,
                        data=data, **prune_kw)
        print(f"ours      (seed {seed}):", json.dumps(ours), flush=True)
        with tempfile.TemporaryDirectory() as wd:
            ref = run_reference(wd, args.epochs, args.rows, args.emb,
                                args.nodes, args.depth, args.batch,
                                args.model, seed, args.lr, synth=synth_npz,
                                **prune_kw)
        print(f"reference (seed {seed}):", json.dumps(ref), flush=True)
        ours_runs.append(ours)
        ref_runs.append(ref)

    # per-epoch trajectory comparison (NOTES round-4 #5): the final-epoch
    # delta conflates semantics with overfit timing; the per-epoch deltas
    # separate them. Only meaningful when both sides report trajectories.
    traj_ok = None   # two-sided trajectory invariant (VERDICT r4 weak #6)
    if any(r.get("trajectory") for r in ours_runs):
        n_ep = min(min((len(r.get("trajectory") or []) for r in ours_runs)),
                   min((len(r.get("trajectory") or []) for r in ref_runs)))
        if n_ep:
            has_sp = all("sparsity" in r["trajectory"][0]
                         for r in ours_runs + ref_runs)
            print("per-epoch valid AUC (mean over seeds):")
            hdr = f"{'epoch':>5s} {'ours':>8s} {'torch':>8s} {'delta':>8s}"
            if has_sp:
                hdr += f" {'oursSp%':>8s} {'torchSp%':>8s} {'dSp':>6s}"
            print(hdr)
            sp_deltas = []
            for e in range(n_ep):
                mo = sum(r["trajectory"][e]["auc"] for r in ours_runs) / len(ours_runs)
                mr = sum(r["trajectory"][e]["auc"] for r in ref_runs) / len(ref_runs)
                line = f"{e + 1:5d} {mo:8.4f} {mr:8.4f} {mo - mr:+8.4f}"
                if has_sp:
                    so = sum(r["trajectory"][e]["sparsity"] for r in ours_runs) / len(ours_runs)
                    sr = sum(r["trajectory"][e]["sparsity"] for r in ref_runs) / len(ref_runs)
                    sp_deltas.append(abs(so - sr))
                    line += f" {so:8.2f} {sr:8.2f} {so - sr:+6.2f}"
                print(line)
            if has_sp and args.prune:
                # done-criterion (VERDICT r4 #2): matched-epoch sparsity
                # within 1 percentage point at every epoch
                print(f"max |sparsity delta|: {max(sp_deltas):.2f} pp "
                      f"({'OK' if max(sp_deltas) <= 1.0 else 'DIVERGENT'})")
            # TRUE parity invariant (VERDICT r4 weak #6): the one-sided
            # final-epoch band is a deployment criterion, not a parity one —
            # the divergence it tolerates is overfit timing. The asserted
            # invariant is TWO-SIDED agreement where semantics dominate:
            # epoch 1 (identical recipe, pre-overfit) and each side's own
            # valid-AUC peak (what per-epoch checkpointing deploys).
            e1 = (sum(r["trajectory"][0]["auc"] for r in ours_runs) / len(ours_runs)
                  - sum(r["trajectory"][0]["auc"] for r in ref_runs) / len(ref_runs))
            pk = (sum(max(t["auc"] for t in r["trajectory"]) for r in ours_runs) / len(ours_runs)
                  - sum(max(t["auc"] for t in r["trajectory"]) for r in ref_runs) / len(ref_runs))
            traj_ok = abs(e1) <= 0.005 and abs(pk) <= 0.005
            if has_sp and args.prune:
                traj_ok = traj_ok and max(sp_deltas) <= 1.0
            print(f"trajectory parity: epoch-1 delta {e1:+.4f}, "
                  f"peak delta {pk:+.4f} (two-sided ±0.005 band: "
                  f"{'OK' if traj_ok else 'DIVERGENT'})")

    import statistics as st
    mean = lambda runs, k: st.mean(r[k] for r in runs)
    std = lambda runs, k: (st.stdev(r[k] for r in runs) if len(runs) > 1 else 0.0)
    if len(seeds) > 1:
        for k in ("auc", "loss"):
            print(f"{k:>4s}: ours {mean(ours_runs, k):.4f}±{std(ours_runs, k):.4f}  "
                  f"reference {mean(ref_runs, k):.4f}±{std(ref_runs, k):.4f}  "
                  f"({len(seeds)} seeds)")
    d_auc = mean(ours_runs, "auc") - mean(ref_runs, "auc")
    d_loss = mean(ours_runs, "loss") - mean(ref_runs, "loss")
    print(f"delta auc {d_auc:+.4f}  delta logloss {d_loss:+.4f} (ours - reference, mean over seeds)")
    if args.synthetic_rows:
        # at-scale band (VERDICT r3 #2): ours must be within 0.005 BELOW the
        # reference; matching or BEATING it both count as parity (round-4
        # 200k×3-epoch measurement: ours +0.0089 AUC over torch, 2 seeds —
        # recorded in PARITY.md with the epoch-2 cross-check)
        ok = d_auc >= -0.005
    else:
        # asymmetric: matching OR beating the reference both count as parity.
        # AUC (ranking) is the primary criterion; logloss calibration swings
        # ±0.17 with init variance for shallow models on tiny data (both
        # directions observed), so it gets a wide band.
        ok = d_auc > -0.03 and d_loss < 0.2
    if traj_ok is not None and args.synthetic_rows:
        # the trajectory invariant is PRIMARY at scale (weak #6): the
        # final-epoch band alone can pass on overfit-timing luck. On the 10k
        # tiny-criteo substrate the ±0.005 band is inside seed noise
        # (PARITY.md multi-seed: ±0.008 std), so there it prints advisory.
        ok = ok and traj_ok
    print("PARITY OK" if ok else "PARITY DIVERGENT")
    if synth_dir:
        import shutil
        shutil.rmtree(synth_dir, ignore_errors=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
