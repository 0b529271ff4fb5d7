"""Dataset fetchers (reference cesium/datasets/*) against locally
synthesized archives via the injectable transport — everything below
the HTTP GET is real: md5 gate, extraction, parsing with default pads,
.dat archive + header rebuild, and the fast-load cache."""

import hashlib
import io
import os
import tarfile
import zipfile

import numpy as np
import pandas as pd
import pytest

from cesium_spark.datasets import (
    ANDRZEJAK_T_MAX, fetch_andrzejak, fetch_asas_training,
)


def _zip_of(files: dict) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        for name, data in files.items():
            z.writestr(name, data)
    return buf.getvalue()


def _targz_of(files: dict) -> bytes:
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w:gz") as t:
        for name, data in files.items():
            info = tarfile.TarInfo(name)
            info.size = len(data)
            t.addfile(info, io.BytesIO(data))
    return buf.getvalue()


def _transport_for(payloads: dict):
    def transport(url):
        name = url.rsplit("/", 1)[1]
        return payloads[name]
    return transport


def test_fetch_andrzejak_end_to_end_and_cache(tmp_path):
    rng = np.random.RandomState(3)
    payloads = {}
    n = 64
    for letter in ("Z", "O", "N", "F", "S"):
        body = {}
        for i in (1, 2):
            m = rng.normal(0, 40, n)
            body[f"{letter}{i:03d}.txt"] = "\n".join(f"{v:.4f}" for v in m).encode()
        payloads[f"{letter}.zip"] = _zip_of(body)
    sums = {k: hashlib.md5(v).hexdigest() for k, v in payloads.items()}

    d = fetch_andrzejak(str(tmp_path), transport=_transport_for(payloads),
                        md5sums=sums)
    assert len(d["times"]) == 10 and len(d["measurements"]) == 10
    # linspace(0, 23.6, n) time pad, class = leading letter
    np.testing.assert_allclose(d["times"][0], np.linspace(0, ANDRZEJAK_T_MAX, n))
    assert sorted(set(d["classes"])) == ["F", "N", "O", "S", "Z"]
    # rebuilt artifacts: tar of .dat files + header CSV
    with tarfile.open(d["archive"]) as t:
        names = t.getnames()
    assert len(names) == 10 and all(x.endswith(".dat") for x in names)
    hdr = pd.read_csv(d["header"])
    assert set(hdr.columns) == {"filename", "class"} and len(hdr) == 10

    # cache hit: a poisoned transport proves no re-download happens
    def boom(url):
        raise AssertionError("network touched despite cache")

    d2 = fetch_andrzejak(str(tmp_path), transport=boom)
    np.testing.assert_allclose(d2["measurements"][3], d["measurements"][3])
    assert list(d2["classes"]) == list(d["classes"])
    assert d2["archive"] == d["archive"]


def test_fetch_andrzejak_md5_gate(tmp_path):
    payloads = {f"{c}.zip": _zip_of({f"{c}001.txt": b"1.0\n2.0\n3.0"})
                for c in ("Z", "O", "N", "F", "S")}
    wrong = {k: "0" * 32 for k in payloads}
    with pytest.raises(ValueError, match="checksum"):
        fetch_andrzejak(str(tmp_path), transport=_transport_for(payloads),
                        md5sums=wrong)
    assert not os.path.exists(str(tmp_path / "andrzejak.npz"))  # no cache


def test_fetch_asas_training_end_to_end_and_cache(tmp_path):
    rng = np.random.RandomState(9)
    series = {}
    for i in range(4):
        n = 20 + 5 * i  # ragged lengths
        t = np.sort(rng.uniform(0, 50, n))
        m = rng.normal(12, 1, n)
        e = rng.uniform(0.01, 0.1, n)
        cols = np.vstack((t, m, e)).T if i % 2 == 0 else np.vstack((t, m)).T
        series[f"star_{i}.dat"] = "\n".join(
            ",".join(f"{v:.6f}" for v in row) for row in cols
        ).encode()
    header = (
        "filename,class,meta1\n"
        + "\n".join(f"star_{i}.dat,CLASS{i % 2},{i * 0.5}" for i in range(4))
    ).encode()
    payloads = {
        "asas_training_set.tar.gz": _targz_of(series),
        "asas_training_set_classes_with_metadata.dat": header,
    }
    sums = {"asas_training_set.tar.gz":
            hashlib.md5(payloads["asas_training_set.tar.gz"]).hexdigest()}

    d = fetch_asas_training(str(tmp_path), transport=_transport_for(payloads),
                            md5sums=sums)
    assert len(d["times"]) == 4 and len(d["errors"]) == 4
    # ragged lengths survive; 2-column files got the default error pad
    from cesium_spark.time_series import DEFAULT_ERROR_VALUE

    assert [len(t) for t in d["times"]] == [20, 25, 30, 35]
    assert (d["errors"][1] == DEFAULT_ERROR_VALUE).all()   # star_1: t,m only
    assert not (d["errors"][0] == DEFAULT_ERROR_VALUE).all()
    # classes Series indexed by shortened name; metadata keeps meta1
    assert d["classes"]["star_2"] == "CLASS0"
    assert abs(d["metadata"].loc["star_3", "meta1"] - 1.5) < 1e-12
    # archive retained (remove_archive=False contract)
    assert os.path.exists(d["archive"])

    def boom(url):
        raise AssertionError("network touched despite cache")

    d2 = fetch_asas_training(str(tmp_path), transport=boom)
    np.testing.assert_allclose(d2["measurements"][2], d["measurements"][2])
    assert d2["classes"].equals(d["classes"])
    assert d2["metadata"].equals(d["metadata"])


def test_asas_single_column_series_and_cache_order(tmp_path):
    """Review findings (r4): a measurement-only (1-column) .dat file
    must get the linspace time pad instead of misparsing as a row
    vector; and the npz cache gate is written LAST so a crash between
    the two cache files re-fetches instead of dying on the pkl."""
    import hashlib

    m_only = "\n".join(f"{v:.3f}" for v in (5.0, 6.0, 7.5, 8.0)).encode()
    payloads = {
        "asas_training_set.tar.gz": _targz_of({"solo.dat": m_only}),
        "asas_training_set_classes_with_metadata.dat":
            b"filename,class\nsolo.dat,X",
    }
    sums = {"asas_training_set.tar.gz":
            hashlib.md5(payloads["asas_training_set.tar.gz"]).hexdigest()}
    d = fetch_asas_training(str(tmp_path), transport=_transport_for(payloads),
                            md5sums=sums)
    assert len(d["times"][0]) == 4 and len(d["measurements"][0]) == 4
    np.testing.assert_allclose(d["measurements"][0], [5.0, 6.0, 7.5, 8.0])
    # linspace pad spans the TimeSeries default range
    assert d["times"][0][0] == 0.0 and d["times"][0][-1] > 0

    # simulate the crash-between-writes: killing the pkl but not the
    # npz must NOT happen by construction — the npz is written last, so
    # deleting the NPZ alone (the gate) forces a clean re-fetch
    os.remove(str(tmp_path / "asas_training.npz"))
    d2 = fetch_asas_training(str(tmp_path), transport=_transport_for(payloads),
                             md5sums=sums)
    np.testing.assert_allclose(d2["measurements"][0], d["measurements"][0])
