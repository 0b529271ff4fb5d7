"""Fast Lomb-Scargle best-period estimate (reference wraps gatspy's
LombScargleFast: /root/reference/cesium/features/lomb_scargle_fast.py).

Status: scaffolding — raises NotImplementedError (NaN via the registry's
error policy) until the Press-Rybicki fast periodogram port lands (M6)."""

from __future__ import annotations

_MSG = "period_fast not yet implemented (SURVEY.md §7 M6)"


def period_fast(t, m, e):
    raise NotImplementedError(_MSG)
