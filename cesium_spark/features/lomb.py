"""Multi-harmonic generalized Lomb-Scargle model + derived periodic
features (numpy port of the reference's Python+Cython pipeline:
/root/reference/cesium/features/lomb_scargle.py, _lomb_scargle.h,
periodic_model.py, period_folding.py, num_alias.py, scatter_res_raw.py).

Status: scaffolding — every public entry point currently raises
NotImplementedError, which the registry's NaN-on-error policy converts to
NaN feature values. The full numpy port lands behind these exact
signatures (milestone M6 in SURVEY.md §7).
"""

from __future__ import annotations

_MSG = "Lomb-Scargle block not yet implemented (SURVEY.md §7 M6)"


def lomb_scargle_model(t, m, e, nharm: int = 8, nfreq: int = 3, tone_control: float = 5.0):
    raise NotImplementedError(_MSG)


def ls_get_frequency(model, i):
    return model["freq_fits"][i - 1]["freq"]


def ls_get_amplitude(model, i, j):
    return model["freq_fits"][i - 1]["amplitude"][j - 1]


def ls_get_rel_phase(model, i, j):
    return model["freq_fits"][i - 1]["rel_phase"][j - 1]


def ls_get_amplitude_ratio(model, i):
    return (
        model["freq_fits"][i - 1]["amplitude"][0]
        / model["freq_fits"][0]["amplitude"][0]
    )


def ls_get_frequency_ratio(model, i):
    return model["freq_fits"][i - 1]["freq"] / model["freq_fits"][0]["freq"]


def ls_get_signif_ratio(model, i):
    return (
        model["freq_fits"][i - 1]["signif"] / model["freq_fits"][0]["signif"]
    )


def ls_get_lambda(model):
    return model["freq_fits"][0]["lambda"]


def ls_get_signif(model):
    return model["freq_fits"][0]["signif"]


def ls_get_varrat(model):
    return model["varrat"]


def ls_get_trend(model):
    return model["freq_fits"][0]["trend"]


def ls_get_y_offset(model):
    return model["freq_fits"][0]["y_offset"]


def ls_num_alias(model):
    raise NotImplementedError(_MSG)


def ls_scatter_res_raw(t, m, e, model):
    raise NotImplementedError(_MSG)


def periodic_model(model):
    raise NotImplementedError(_MSG)


def pm_max_delta_mags(pm):
    return pm["max_delta_mags"]


def pm_min_delta_mags(pm):
    return pm["min_delta_mags"]


def pm_phi1_phi2(pm):
    return pm["phi1_phi2"]


def period_folding(t, m, e, model):
    raise NotImplementedError(_MSG)


def pf_slope_percentile(pf, p):
    return pf["fold2P_slope_percentiles"][p]


def pf_medperc90_2p_p(pf):
    return pf["medperc90_2p_p"]


def p2p_model(t, m, freq1):
    raise NotImplementedError(_MSG)


def p2p_scatter_2praw(p2p):
    return p2p["scatter_2praw"]


def p2p_scatter_over_mad(p2p):
    return p2p["scatter_over_mad"]


def p2p_scatter_pfold_over_mad(p2p):
    return p2p["scatter_pfold_over_mad"]


def p2p_ssqr_diff_over_var(p2p):
    return p2p["ssqr_diff_over_var"]
