"""libjxl_tpu: a TPU-native JPEG XL codec (JAX/XLA/Pallas).

Enables the persistent XLA compilation cache by default: the codec's
device programs (lossless group pipeline, VarDCT loop, filters) take
minutes to compile on TPU but are stable across processes, and every
CLI/bench/test invocation is a fresh process. Opt out by setting
JAX_COMPILATION_CACHE_DIR explicitly (e.g. to an empty string).
"""

import os as _os

_cache = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                       _os.pardir, ".jax_cache")
_os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                       _os.path.abspath(_cache))
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

try:  # late import: honor the env vars even if jax is already loaded
    import sys as _sys
    if "jax" in _sys.modules:
        import jax as _jax
        if _os.environ["JAX_COMPILATION_CACHE_DIR"]:
            _jax.config.update(
                "jax_compilation_cache_dir",
                _os.environ["JAX_COMPILATION_CACHE_DIR"])
            _jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 2.0)
except Exception:  # pragma: no cover - cache is best-effort
    pass
