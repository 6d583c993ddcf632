"""Pallas TPU kernels (the rebuild's native-equivalent layer, SURVEY.md
§2.4) and the Mosaic/jax compatibility pin.

The kernels are written against Mosaic's lowering rules as of the tested
jax version below; Mosaic APIs move between releases (round-2 hard
lesson: interpret-mode green does NOT imply Mosaic green).  On a version
drift we warn once — never crash: the kernels may still work, and
``emspec.dsp.pallas.validate.validate_kernels()`` is the documented
upgrade smoke test that settles it on the live backend (every ``emspec
bench`` / ``python bench.py`` run re-validates before reporting).
"""

from __future__ import annotations

import warnings

# The jax/jaxlib version the Mosaic kernels were last validated against
# on real TPU v5e hardware (EMSPEC_TPU_TESTS=1 pytest tests/test_tpu.py).
TESTED_JAX_VERSION = "0.9.0"

_warned = False


def check_jax_compat() -> bool:
    """Warn (once) when the runtime jax differs from the tested version.
    Returns True when the versions match."""
    global _warned
    import jax

    ok = jax.__version__ == TESTED_JAX_VERSION
    if not ok and not _warned:
        _warned = True
        warnings.warn(
            f"emspec's Pallas kernels were validated against jax "
            f"{TESTED_JAX_VERSION}; running {jax.__version__}. Mosaic "
            f"APIs move between releases — run emspec.dsp.pallas."
            f"validate.validate_kernels() (or `emspec bench --quick`) "
            f"on the target backend before trusting kernel output.",
            RuntimeWarning, stacklevel=2)
    return ok
