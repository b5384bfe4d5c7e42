"""Runtime shape checking for the host-side data contract.

The reference turns on a jaxtyping+beartype import hook for its whole
package (reference __main__.py:2-7), making every annotated call a shape
assertion. This environment ships jaxtyping + typeguard (no beartype), so
the same mechanism is installed with typeguard as the checker, scoped to
the layers where shape bugs actually corrupt data silently — the signal
codec (``osu_dreamer_tpu.signal``): hit/cursor encode-decode and the disk
format carry ``Float[np.ndarray, "7 L"]``-style annotations that are then
enforced on every call.

Enabled by the CLI entry point (``python -m osu_dreamer_tpu``) unless
``OSU_DREAMER_TYPECHECK=0``; library importers opt in via
:func:`install_typecheck` BEFORE importing the checked modules (import
hooks only affect modules not yet imported).
"""

from __future__ import annotations

import os

_CHECKED_PACKAGES = ("osu_dreamer_tpu.signal",)


def typecheck_enabled() -> bool:
    return os.environ.get("OSU_DREAMER_TYPECHECK", "1") != "0"


def install_typecheck() -> bool:
    """install the jaxtyping+typeguard import hook over the checked
    packages; returns False when the checker stack is unavailable or
    disabled. Call before importing osu_dreamer_tpu.signal."""
    if not typecheck_enabled():
        return False
    try:
        import typeguard  # noqa: F401
        from jaxtyping import install_import_hook
    except ImportError:
        return False
    install_import_hook(list(_CHECKED_PACKAGES), "typeguard.typechecked")
    return True
