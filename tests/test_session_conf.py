"""Session config validation (r15): the Arrow per-batch byte-cap
override must be clamped to a sane band — a measured absurd value
(2^40) wedged the Arrow writer for minutes, so misconfiguration fails
loudly at session build instead of degrading every kernel downstream.
Pure-function tests; no Spark session required."""

import pytest

from parcialbigdata_spark.session import _arrow_max_bytes


def _with_env(monkeypatch, value):
    if value is None:
        monkeypatch.delenv("SPARK_GRAFT_ARROW_MAX_BYTES", raising=False)
    else:
        monkeypatch.setenv("SPARK_GRAFT_ARROW_MAX_BYTES", value)


def test_default_is_64_mib(monkeypatch):
    _with_env(monkeypatch, None)
    assert _arrow_max_bytes() == 64 * 1024 * 1024


@pytest.mark.parametrize("v", ["1048576", "4194304", "1073741824"])
def test_band_edges_accepted(monkeypatch, v):
    _with_env(monkeypatch, v)
    assert _arrow_max_bytes() == int(v)


@pytest.mark.parametrize("v", ["1048575", str(1 << 40), "0", "-1"])
def test_out_of_band_raises(monkeypatch, v):
    _with_env(monkeypatch, v)
    with pytest.raises(ValueError, match="sane band"):
        _arrow_max_bytes()


def test_non_integer_raises(monkeypatch):
    _with_env(monkeypatch, "64m")
    with pytest.raises(ValueError, match="integer byte count"):
        _arrow_max_bytes()
