import os as _os

import jax as _jax

# Persistent compilation cache: whole-fit programs are large (a multi-epoch
# scan), so caching compiled executables across processes matters for
# interactive use and benchmarking.  Respect an existing user configuration.
if not _os.environ.get("JAX_COMPILATION_CACHE_DIR"):
    try:
        if _jax.config.jax_compilation_cache_dir is None:
            _jax.config.update(
                "jax_compilation_cache_dir",
                _os.path.expanduser("~/.cache/lightfm_tpu/jax_cache"),
            )
            _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - config API drift
        pass

from lightfm_tpu.model import LightFM  # noqa: F401,E402
from lightfm_tpu.version import __version__  # noqa: F401,E402
from lightfm_tpu.checkpoint import load_model, save_model  # noqa: F401,E402

__all__ = ["LightFM", "save_model", "load_model", "__version__"]
