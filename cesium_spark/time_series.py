"""In-memory TimeSeries container with the reference's exact semantics
(/root/reference/cesium/time_series.py:111-317): shape normalization,
default time/error fills, time-sorting, channel iteration, and the .npz
serialization format.

This is deliberately a DRIVER-SIDE interchange object — one series in
memory, the shape cesium users hand around before featurizing. The
engine's scale path is the long-format DataFrame (kernel.featurize);
`api.featurize_time_series` and `sources.featureset_io` accept both.

Semantics matched (and pinned by the ported reference tests):
  - m 1-d: single channel; t/e default to linspace(0, DEFAULT_MAX_TIME)
    / DEFAULT_ERROR_VALUE;
  - m 2-d ndarray: p channels; shared 1-d t/e broadcast across channels
    AFTER sorting;
  - m ragged (list of unequal 1-d arrays): per-channel t/e required
    (broadcasting a shared 1-d t onto ragged channels is an error);
  - t-only construction fills m with NaN;
  - sort() orders every channel by its own times;
  - save()/load() roundtrip through the reference npz layout
    (time/measurement/error or per-channel time0.., meta_feat_names/
    values, scalar name/label).
"""

from __future__ import annotations

import numpy as np

from .kernel import DEFAULT_ERROR_VALUE

DEFAULT_MAX_TIME = 1.0  # reference time_series.py:9

__all__ = ["TimeSeries", "load", "DEFAULT_MAX_TIME", "DEFAULT_ERROR_VALUE"]


def _depth(x) -> int:
    """Nesting depth of a (possibly ragged) array-like."""
    d = 0
    while hasattr(x, "__len__") and not isinstance(x, (str, bytes)):
        d += 1
        x = x[0] if len(x) else []
    return d


def _compatible_shapes(x, y) -> bool:
    """True when two (possibly ragged) structures agree elementwise in
    length at every level."""
    if hasattr(x, "__len__") != hasattr(y, "__len__"):
        return False
    if not hasattr(x, "__len__"):
        return True
    if len(x) != len(y):
        return False
    return all(_compatible_shapes(a, b) for a, b in zip(x, y))


def _squeeze_or_keep(x):
    """(1, n) -> (n,); uniform list of arrays -> (p, n) ndarray; ragged
    stays a list of float arrays."""
    try:
        return np.asarray(x, dtype=float).squeeze()
    except ValueError:
        return [np.asarray(c, dtype=float) for c in x]


def _like(x, value=None, upper=None):
    """Array(s) shaped like x: constant fill or 0..upper linspace, per
    innermost array."""
    if _depth(x) == 1:
        n = len(x)
        return (
            np.full(n, value, dtype=float)
            if value is not None
            else np.linspace(0.0, upper, n)
        )
    return [_like(c, value=value, upper=upper) for c in x]


class TimeSeries:
    """One time series (single- or multi-channel) + metadata."""

    def __init__(
        self,
        t=None,
        m=None,
        e=None,
        label=None,
        meta_features=None,
        name=None,
        path=None,
        channel_names=None,
    ):
        if t is None and m is None:
            raise ValueError("Either times or measurements must be provided.")
        if m is None:
            m = _like(t, value=np.nan)
        md = _depth(m)
        if md == 1:
            self.n_channels = 1
            if t is None:
                t = _like(m, upper=DEFAULT_MAX_TIME)
            if e is None:
                e = _like(m, value=DEFAULT_ERROR_VALUE)
        elif md == 2:
            self.n_channels = len(m)
            rectangular = isinstance(m, np.ndarray) and getattr(m, "ndim", 0) == 2
            # rectangular channels share one default t/e row; ragged
            # channels each get their own
            proto = m[0] if rectangular else m
            if t is None:
                t = _like(proto, upper=DEFAULT_MAX_TIME)
            if e is None:
                e = _like(proto, value=DEFAULT_ERROR_VALUE)
        else:
            raise ValueError("m must be a 1D or 2D array, or a 2D list of arrays.")

        self.time = _squeeze_or_keep(t)
        self.measurement = _squeeze_or_keep(m)
        self.error = _squeeze_or_keep(e)
        self.sort()  # order by time BEFORE any broadcasting

        if _depth(self.measurement) == 2:
            if _depth(self.time) == 1:
                if not isinstance(self.measurement, np.ndarray):
                    raise ValueError(
                        "Times for each channel must be provided if m is a "
                        "ragged array."
                    )
                self.time = np.broadcast_to(self.time, self.measurement.shape)
            if _depth(self.error) == 1:
                if not isinstance(self.measurement, np.ndarray):
                    raise ValueError(
                        "Errors for each channel must be provided if m is a "
                        "ragged array."
                    )
                self.error = np.broadcast_to(self.error, self.measurement.shape)

        if not (
            _compatible_shapes(self.measurement, self.time)
            and _compatible_shapes(self.measurement, self.error)
        ):
            raise ValueError(
                "times, values, errors are not of compatible types/sizes. "
                "Please refer to the docstring for list of allowed input "
                "types."
            )

        self.label = label
        self.meta_features = dict(meta_features or {})
        self.name = name
        self.path = path
        self.channel_names = (
            list(channel_names)
            if channel_names is not None
            else [f"channel_{i}" for i in range(self.n_channels)]
        )

    def channels(self):
        """Iterate (t, m, e) per channel; shared 1-d arrays broadcast."""

        def rows(x):
            if isinstance(x, np.ndarray) and x.ndim == 1:
                return np.broadcast_to(x, (self.n_channels, len(x)))
            return x

        return zip(rows(self.time), rows(self.measurement), rows(self.error))

    def sort(self):
        """Order every channel by its own time values (stable co-sort of
        t/m/e)."""
        if _depth(self.time) == 1:
            order = np.argsort(self.time)
            self.time = np.asarray(self.time)[order]
            if _depth(self.measurement) == 1:
                self.measurement = np.asarray(self.measurement)[order]
            else:
                if not isinstance(self.measurement, np.ndarray):
                    # shared 1-d times cannot order ragged channels; the
                    # reference hits an IndexError here — fail with the
                    # contract's actual message instead
                    raise ValueError(
                        "Times for each channel must be provided if m is a "
                        "ragged array."
                    )
                for i in range(len(self.measurement)):
                    self.measurement[i] = self.measurement[i][order]
            if _depth(self.error) == 1:
                self.error = np.asarray(self.error)[order]
            else:
                for i in range(len(self.error)):
                    self.error[i] = self.error[i][order]
        else:
            for i in range(len(self.time)):
                order = np.argsort(self.time[i])
                self.time[i] = self.time[i][order]
                self.measurement[i] = self.measurement[i][order]
                self.error[i] = self.error[i][order]

    def save(self, path=None):
        """Serialize in the reference's .npz layout (readable by the
        reference's loader and by sources.featureset_io.read_ts_npz)."""
        path = path or self.path
        data = {
            "meta_feat_names": list(self.meta_features.keys()),
            "meta_feat_values": list(self.meta_features.values()),
        }
        for key, value in (
            ("time", self.time),
            ("measurement", self.measurement),
            ("error", self.error),
        ):
            if isinstance(value, np.ndarray):
                data[key] = value
            else:  # ragged: one entry per channel (time0, time1, ...)
                for i, channel in enumerate(value):
                    data[f"{key}{i}"] = channel
        if self.name:
            data["name"] = self.name
        if self.label:
            data["label"] = self.label
        np.savez(path, **data)


def load(ts_path: str) -> TimeSeries:
    """Read a TimeSeries .npz back into the class (reference
    time_series.py:85-108)."""
    from .sources.featureset_io import read_ts_npz

    d = read_ts_npz(ts_path)

    def none_if_empty(x):
        return None if (x is None or len(x) == 0) else x

    return TimeSeries(
        t=none_if_empty(d["time"]),
        m=none_if_empty(d["measurement"]),
        e=none_if_empty(d["error"]),
        meta_features=d["meta_features"],
        name=d["name"],
        label=d["label"],
    )
