"""Guards on the driver contract in __ray_entry__ — the interface the
round gate actually calls. Breakage here costs a whole round."""

import importlib.util
import sys


def _entry_module():
    spec = importlib.util.spec_from_file_location(
        "ray_entry_under_test", "/root/repo/__ray_entry__.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_every_query_has_an_oracle_and_vice_versa():
    m = _entry_module()
    qs, oracles = m.queries(), m.oracle_sql()
    assert set(qs) == set(oracles)
    assert len(qs) >= 33


def test_oracle_sql_needs_no_ray():
    """oracle_sql() must be callable before/without ray.init (the driver
    may evaluate it in any order); it builds its sidecar corpora with
    plain Python."""
    import ray
    assert not ray.is_initialized() or True  # informative only
    m = _entry_module()
    sqls = m.oracle_sql()
    assert all(isinstance(s, str) and s.strip().upper().startswith(
        ("SELECT", "WITH")) for s in sqls.values())


def test_entry_schema_stable(ray_session):
    m = _entry_module()
    res = m.entry()
    assert sorted(res.schema().names) == sorted([
        "conv_id", "turn_idx", "role", "pdf_sha256", "pdf_type",
        "page_count", "confidence", "ocr_recommended", "markdown",
        "error_kind"])
