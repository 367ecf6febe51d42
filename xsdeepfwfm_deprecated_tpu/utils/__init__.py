
import os as _os


def enable_compilation_cache(cache_dir: str = None) -> None:
    """Persistent XLA compilation cache — new processes reuse compiled
    executables instead of recompiling every shape (minutes per run on
    remote-compile TPU attachments)."""
    import jax
    cache_dir = cache_dir or _os.path.expanduser("~/.cache/xsdeepfwfm_jax_cache")
    _os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # older jax without the knobs
