"""Damped-random-walk (QSO) model fit — numpy port of the reference's
Rybicki-Press banded solver pipeline
(/root/reference/cesium/features/qso_model.py).

Status: scaffolding — qso_fit raises NotImplementedError (NaN via the
registry's error policy) until the banded-Cholesky port lands (M6)."""

from __future__ import annotations

import numpy as np

_MSG = "QSO damped-random-walk model not yet implemented (SURVEY.md §7 M6)"


def qso_fit(t, m, e):
    raise NotImplementedError(_MSG)


def qso_log_chi2_qsonu(model):
    """log10 of chi^2/nu of the QSO-model fit."""
    return np.log10(model["chi2_qso/nu"])


def qso_log_chi2nuNULL_chi2nu(model):
    """log10 ratio of null-model to QSO-model chi^2/nu."""
    return np.log10(model["chi2_qso/nu_NULL"] / model["chi2_qso/nu"])
