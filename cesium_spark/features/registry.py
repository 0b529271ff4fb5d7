"""Per-series feature registry + tiny graph evaluator.

The registry mirrors the reference's feature DAG
(/root/reference/cesium/features/graphs.py:215-359): each node is either a
leaf input ('t', 'm', 'e') or a task tuple ``(callable, *args)`` where
string args name other nodes and non-string args are literals. Shared
intermediates (``cads``, ``delta_t_hist``, ``_lomb_model``, …) are computed
once per evaluation, exactly like the reference's dask graph.

Evaluation semantics:
  - cull: only ancestors of the requested features are computed (the
    reference delegates this to dask.cull; here it's a direct topo walk).
  - failure policy: an exception in a node yields NaN for that node's
    features and every dependent feature (reference: featurize.py:76-95).
  - custom features: user-supplied ``{name: callable(t, m, e)}`` or raw
    task tuples merge into the graph (reference: featurize.py:66-74).

All of this is plain Python executed *inside* one vectorized
``applyInPandas`` invocation per series/window — Spark provides the
cross-series parallelism; within a series evaluation is serial, matching
the reference's "parallelize across series, not within" design.
"""

from __future__ import annotations

import numpy as np

from . import cadence as cad
from . import general as gen
from .stats import moment_kurtosis, moment_skew
from .lomb import (
    lomb_scargle_model,
    ls_get_frequency,
    ls_get_amplitude,
    ls_get_rel_phase,
    ls_get_amplitude_ratio,
    ls_get_frequency_ratio,
    ls_get_signif_ratio,
    ls_get_lambda,
    ls_get_signif,
    ls_get_varrat,
    ls_get_trend,
    ls_get_y_offset,
    ls_num_alias,
    ls_scatter_res_raw,
    periodic_model,
    pm_max_delta_mags,
    pm_min_delta_mags,
    pm_phi1_phi2,
    period_folding,
    pf_slope_percentile,
    pf_medperc90_2p_p,
    p2p_model,
    p2p_scatter_2praw,
    p2p_scatter_over_mad,
    p2p_scatter_pfold_over_mad,
    p2p_ssqr_diff_over_var,
)
from .qso import qso_fit, qso_log_chi2_qsonu, qso_log_chi2nuNULL_chi2nu
from .period_fast import period_fast

__all__ = [
    "CADENCE_FEATS",
    "GENERAL_FEATS",
    "LOMB_SCARGLE_FEATS",
    "ALL_FEATS",
    "FEATURE_GRAPH",
    "build_graph",
    "cull",
    "evaluate",
    "compute_features",
]

_CAD_PROB_MINUTES = (
    1, 10, 20, 30, 40, 50, 100, 500, 1000, 5000,
    10000, 50000, 100000, 500000, 1000000, 5000000, 10000000,
)

CADENCE_FEATS = (
    [
        "n_epochs", "avg_err", "med_err", "std_err", "total_time", "avgt",
        "cads_std", "cads_skew", "cads_kurtosis", "mean", "cads_avg", "cads_med",
    ]
    + [f"cad_probs_{k}" for k in _CAD_PROB_MINUTES]
    + [
        "med_double_to_single_step", "avg_double_to_single_step",
        "std_double_to_single_step",
        "all_times_nhist_numpeaks", "all_times_nhist_peak_val",
        "all_times_nhist_peak_1_to_2", "all_times_nhist_peak_1_to_3",
        "all_times_nhist_peak_2_to_3", "all_times_nhist_peak_1_to_4",
        "all_times_nhist_peak_2_to_4", "all_times_nhist_peak_3_to_4",
        "all_times_nhist_peak1_bin", "all_times_nhist_peak2_bin",
        "all_times_nhist_peak3_bin", "all_times_nhist_peak4_bin",
    ]
)

GENERAL_FEATS = [
    "amplitude", "anderson_darling",
    "flux_percentile_ratio_mid20", "flux_percentile_ratio_mid35",
    "flux_percentile_ratio_mid50", "flux_percentile_ratio_mid65",
    "flux_percentile_ratio_mid80",
    "max_slope", "maximum", "median", "median_absolute_deviation", "minimum",
    "percent_amplitude", "percent_beyond_1_std", "percent_close_to_median",
    "percent_difference_flux_percentile",
    "period_fast", "qso_log_chi2_qsonu", "qso_log_chi2nuNULL_chi2nu",
    "skew", "std", "stetson_j", "stetson_k", "shapiro_wilk",
    "weighted_average", "weighted_std_dev",
]

LOMB_SCARGLE_FEATS = (
    ["fold2P_slope_10percentile", "fold2P_slope_90percentile"]
    + [f"freq{i}_amplitude{j}" for i in (1, 2, 3) for j in (1, 2, 3, 4)]
    + [f"freq{i}_freq" for i in (1, 2, 3)]
    + ["freq1_lambda"]
    + [f"freq{i}_rel_phase{j}" for i in (1, 2, 3) for j in (2, 3, 4)]
    + ["freq1_signif"]
    + [
        "freq_amplitude_ratio_21", "freq_amplitude_ratio_31",
        "freq_frequency_ratio_21", "freq_frequency_ratio_31",
        "freq_model_max_delta_mags", "freq_model_min_delta_mags",
        "freq_model_phi1_phi2", "freq_n_alias",
        "freq_signif_ratio_21", "freq_signif_ratio_31",
        "freq_varrat", "freq_y_offset", "linear_trend",
        "medperc90_2p_p",
        "p2p_scatter_2praw", "p2p_scatter_over_mad",
        "p2p_scatter_pfold_over_mad", "p2p_ssqr_diff_over_var",
        "scatter_res_raw",
    ]
)


def _total_time(t):
    return np.max(t) - np.min(t)


def _build_feature_graph() -> dict:
    g = {
        "n_epochs": (len, "t"),
        "avg_err": (np.mean, "e"),
        "med_err": (np.median, "e"),
        "std_err": (np.std, "e"),
        "total_time": (_total_time, "t"),
        "avgt": (np.mean, "t"),
        "cads": (np.diff, "t"),
        "cads_std": (np.std, "cads"),
        "cads_skew": (moment_skew, "cads"),
        "cads_kurtosis": (moment_kurtosis, "cads"),
        "mean": (np.mean, "m"),
        "cads_avg": (np.mean, "cads"),
        "cads_med": (np.median, "cads"),
        "double_to_single_step": (cad.step_ratios, "cads"),
        "avg_double_to_single_step": (np.mean, "double_to_single_step"),
        "med_double_to_single_step": (np.median, "double_to_single_step"),
        "std_double_to_single_step": (np.std, "double_to_single_step"),
        "delta_t_hist": (cad.pairwise_dt_hist, "t"),
        "delta_t_nhist": (cad.normalized_hist, "delta_t_hist", "total_time"),
        "nhist_peaks": (cad.sorted_local_maxima, "delta_t_nhist"),
        "all_times_nhist_numpeaks": (len, "nhist_peaks"),
        "all_times_nhist_peak_val": (np.max, "delta_t_nhist"),
        # general / value-axis
        "amplitude": (gen.amplitude, "m"),
        "anderson_darling": (gen.anderson_darling, "m", "e"),
        "maximum": (np.max, "m"),
        "max_slope": (gen.max_slope, "t", "m"),
        "median": (np.median, "m"),
        "median_absolute_deviation": (gen.median_absolute_deviation, "m"),
        "minimum": (np.min, "m"),
        "percent_amplitude": (gen.percent_amplitude, "m"),
        "percent_beyond_1_std": (gen.percent_beyond_1_std, "m", "e"),
        "percent_close_to_median": (gen.percent_close_to_median, "m"),
        "percent_difference_flux_percentile": (gen.percent_difference_flux_percentile, "m"),
        "skew": (moment_skew, "m"),
        # engine extension (not in cesium's registry, which only has
        # cads_kurtosis): kurtosis of the value channel
        "kurtosis": (moment_kurtosis, "m"),
        "std": (np.std, "m"),
        "stetson_j": (gen.stetson_j, "m"),
        "stetson_k": (gen.stetson_k, "m"),
        "shapiro_wilk": (gen.shapiro_wilk, "m", "e"),
        "weighted_average": (gen.weighted_average, "m", "e"),
        "weighted_std_dev": (gen.weighted_std_dev, "m", "e"),
        # QSO damped-random-walk model
        "qso_model": (qso_fit, "t", "m", "e"),
        "qso_log_chi2_qsonu": (qso_log_chi2_qsonu, "qso_model"),
        "qso_log_chi2nuNULL_chi2nu": (qso_log_chi2nuNULL_chi2nu, "qso_model"),
        # periodic block
        "period_fast": (period_fast, "t", "m", "e"),
        "_lomb_model": (lomb_scargle_model, "t", "m", "e"),
        "freq1_lambda": (ls_get_lambda, "_lomb_model"),
        "freq1_signif": (ls_get_signif, "_lomb_model"),
        "freq_varrat": (ls_get_varrat, "_lomb_model"),
        "linear_trend": (ls_get_trend, "_lomb_model"),
        "freq_y_offset": (ls_get_y_offset, "_lomb_model"),
        "freq_n_alias": (ls_num_alias, "_lomb_model"),
        "scatter_res_raw": (ls_scatter_res_raw, "t", "m", "e", "_lomb_model"),
        "_periodic_model": (periodic_model, "_lomb_model"),
        "_period_folded_model": (period_folding, "t", "m", "e", "_lomb_model"),
        "freq_model_max_delta_mags": (pm_max_delta_mags, "_periodic_model"),
        "freq_model_min_delta_mags": (pm_min_delta_mags, "_periodic_model"),
        "freq_model_phi1_phi2": (pm_phi1_phi2, "_periodic_model"),
        "fold2P_slope_10percentile": (pf_slope_percentile, "_period_folded_model", 10),
        "fold2P_slope_90percentile": (pf_slope_percentile, "_period_folded_model", 90),
        "medperc90_2p_p": (pf_medperc90_2p_p, "_period_folded_model"),
        "_p2p_model": (p2p_model, "t", "m", "freq1_freq"),
        "p2p_scatter_2praw": (p2p_scatter_2praw, "_p2p_model"),
        "p2p_scatter_over_mad": (p2p_scatter_over_mad, "_p2p_model"),
        "p2p_scatter_pfold_over_mad": (p2p_scatter_pfold_over_mad, "_p2p_model"),
        "p2p_ssqr_diff_over_var": (p2p_ssqr_diff_over_var, "_p2p_model"),
    }
    for k in _CAD_PROB_MINUTES:
        g[f"cad_probs_{k}"] = (cad.cadence_prob, "cads", k)
    for i, j in ((1, 2), (1, 3), (2, 3), (1, 4), (2, 4), (3, 4)):
        g[f"all_times_nhist_peak_{i}_to_{j}"] = (cad.nth_peak_ratio, "nhist_peaks", i, j)
    for i in (1, 2, 3, 4):
        g[f"all_times_nhist_peak{i}_bin"] = (cad.nth_peak_bin, "nhist_peaks", i)
    for r in (20, 35, 50, 65, 80):
        g[f"flux_percentile_ratio_mid{r}"] = (gen.flux_percentile_ratio, "m", r)
    for i in (1, 2, 3):
        g[f"freq{i}_freq"] = (ls_get_frequency, "_lomb_model", i)
        for j in (1, 2, 3, 4):
            g[f"freq{i}_amplitude{j}"] = (ls_get_amplitude, "_lomb_model", i, j)
        for j in (2, 3, 4):
            g[f"freq{i}_rel_phase{j}"] = (ls_get_rel_phase, "_lomb_model", i, j)
    for i in (2, 3):
        g[f"freq_amplitude_ratio_{i}1"] = (ls_get_amplitude_ratio, "_lomb_model", i)
        g[f"freq_frequency_ratio_{i}1"] = (ls_get_frequency_ratio, "_lomb_model", i)
        g[f"freq_signif_ratio_{i}1"] = (ls_get_signif_ratio, "_lomb_model", i)
    return g


FEATURE_GRAPH = _build_feature_graph()
ALL_FEATS = CADENCE_FEATS + GENERAL_FEATS + LOMB_SCARGLE_FEATS


def build_graph(t, m, e, custom_functions=None, meta_features=None) -> dict:
    """Assemble the full graph for one series: inputs + registry (+ user
    extensions and meta-feature leaves)."""
    g = {"t": t, "m": m, "e": e}
    g.update(FEATURE_GRAPH)
    if meta_features:
        g.update(meta_features)
    if custom_functions:
        for name, fn in custom_functions.items():
            if isinstance(fn, tuple):  # raw task tuple, dask-graph style
                g[name] = fn
            else:
                g[name] = (fn, "t", "m", "e")
    return g


def cull(graph: dict, requested: list) -> set:
    """Names of all graph nodes reachable (as dependencies) from
    `requested` — the only nodes that will be computed."""
    needed = set()
    stack = [r for r in requested if r in graph]
    while stack:
        name = stack.pop()
        if name in needed:
            continue
        needed.add(name)
        node = graph[name]
        if isinstance(node, tuple) and callable(node[0]):
            for arg in node[1:]:
                if isinstance(arg, str) and arg in graph:
                    stack.append(arg)
    return needed


class _Failed:
    """Sentinel marking a node whose computation raised; dependents see it
    and fail too, surfacing as NaN in the output."""

    __slots__ = ("err",)

    def __init__(self, err):
        self.err = err


def evaluate(graph: dict, requested: list, raise_exceptions: bool = False) -> dict:
    """Topologically evaluate `requested` nodes (+ ancestors) of `graph`.

    Failed nodes and their dependents evaluate to NaN (unless
    raise_exceptions). Unknown feature names evaluate to NaN.
    """
    needed = cull(graph, requested)
    done: dict = {}

    def _eval(name):
        if name in done:
            return done[name]
        node = graph[name]
        if isinstance(node, tuple) and callable(node[0]):
            fn, *args = node
            vals = []
            failed = None
            for a in args:
                if isinstance(a, str) and a in graph:
                    v = _eval(a)
                    if isinstance(v, _Failed):
                        failed = v
                    vals.append(v)
                else:
                    vals.append(a)
            if failed is not None:
                result = failed
            else:
                try:
                    result = fn(*vals)
                except Exception as err:  # noqa: BLE001 - NaN-on-error policy
                    if raise_exceptions:
                        raise
                    result = _Failed(err)
        else:
            result = node
        done[name] = result
        return result

    # iterative-safe: graph depth is tiny (<6), recursion is fine
    out = {}
    for name in requested:
        if name not in needed:
            out[name] = float("nan")
            continue
        v = _eval(name)
        out[name] = float("nan") if isinstance(v, _Failed) else v
    return out


def compute_features(
    t,
    m,
    e,
    features,
    custom_functions=None,
    meta_features=None,
    raise_exceptions: bool = False,
) -> dict:
    """Compute the requested features for one already-sorted series; returns
    {name: float}. This is the single-series kernel the Spark layer wraps."""
    import warnings

    t = np.ascontiguousarray(t, dtype=np.float64)
    m = np.ascontiguousarray(m, dtype=np.float64)
    e = np.ascontiguousarray(e, dtype=np.float64)
    graph = build_graph(t, m, e, custom_functions, meta_features)
    # NaN results (empty slices, 0/0) are expected under the NaN-on-error
    # policy; don't spam executors' stderr with numpy RuntimeWarnings.
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        vals = evaluate(graph, list(features), raise_exceptions=raise_exceptions)
    return {k: float(v) for k, v in vals.items()}
