"""A36 logging/metrics service + A6 REST source behavior."""

from __future__ import annotations

import io
import json

import pytest

from iceberg_loader_spark.services import (
    configure_logging,
    metrics,
    suppress_and_warn,
)
from iceberg_loader_spark.sources.normalize import create_arrow_table_from_data
from iceberg_loader_spark.sources.rest import RestSource


def test_json_log_format_carries_metrics():
    buf = io.StringIO()
    configure_logging(log_format="JSON", component="test-comp", stream=buf)
    metrics("rows_loaded", {"rows": 42, "table": "db.t"})
    rec = json.loads(buf.getvalue().strip())
    assert rec["level"] == "INFO"
    assert rec["message"] == "METRIC: rows_loaded"
    assert rec["component"] == "test-comp"
    assert rec["metrics"] == {"rows": 42, "table": "db.t"}


def test_text_log_format():
    buf = io.StringIO()
    log = configure_logging(log_format="TEXT", stream=buf)
    log.warning("something odd")
    line = buf.getvalue().strip()
    assert "[WARNING]" in line and "something odd" in line


def test_suppress_and_warn_swallows():
    buf = io.StringIO()
    configure_logging(log_format="TEXT", stream=buf)
    with suppress_and_warn("maintenance failed"):
        raise RuntimeError("boom")
    out = buf.getvalue()
    assert "maintenance failed" in out and "boom" in out


def test_rest_source_list_payload():
    def transport(url, timeout):
        assert url == "http://api.test/v1/customers"
        return json.dumps([{"id": 1, "name": "a"}, {"id": 2, "name": "b"}])

    src = RestSource("http://api.test/v1", transport=transport)
    batches = list(src.get_data("customers"))
    assert batches == [[{"id": 1, "name": "a"}, {"id": 2, "name": "b"}]]


def test_rest_source_wraps_non_list():
    src = RestSource("http://api.test/v1", transport=lambda u, t: '{"id": 1}')
    assert list(src.get_data("x")) == [[{"id": 1}]]


def test_rest_source_propagates_transport_error():
    def bad(url, timeout):
        raise OSError("HTTP 500")

    src = RestSource("http://api.test/v1", transport=bad)
    with pytest.raises(OSError):
        list(src.get_data("x"))


def test_rest_batches_feed_messy_json_path():
    rows = [{"id": 1, "cfg": {"a": 1, "b": "x"}}, {"id": 2, "cfg": [1, 2, 3]}]
    src = RestSource("http://api.test/v1", transport=lambda u, t: json.dumps(rows))
    (batch,) = src.get_data("things")
    tbl = create_arrow_table_from_data(batch)
    assert tbl.column("cfg").to_pylist() == ['{"a":1,"b":"x"}', "[1,2,3]"]
