"""Third-party span-format plugins (§2.10 plugin-protocol parity —
reference discovers plugins from entry points, manager.py:434-460)."""

from __future__ import annotations

import pytest

from rdf_dtdl_fabric_ontology_converter_spark import plugins as plug
from rdf_dtdl_fabric_ontology_converter_spark.plugins import (
    FormatPlugin, discover_plugins, register_format, registered_formats,
    unregister_format)


# Factory-nested callables: cloudpickle ships them BY VALUE into the UDF
# closure (a real installed plugin's top-level functions are shipped by
# module reference instead — the test module itself is not importable on
# executors, which is exactly the scenario the closure-capture design
# must survive).
def _make_csvkv(name: str = "csvkv") -> FormatPlugin:
    def sniff(text: str) -> bool:
        return text.lstrip().startswith("#csvkv")

    def parse(text: str) -> list:
        rows = []
        for line in text.splitlines():
            if not line or line.startswith("#"):
                continue
            s, p, o = line.split(",", 2)
            if o == "BOOM":
                raise ValueError("poison row")
            rows.append((s, p, o, "literal", None, None, None))
        return rows

    return FormatPlugin(name, sniff, parse)


@pytest.fixture
def csvkv_plugin():
    register_format(_make_csvkv())
    yield
    unregister_format("csvkv")


def test_registry_rejects_builtin_and_bad_names():
    with pytest.raises(ValueError, match="built-in"):
        register_format(_make_csvkv("turtle"))
    with pytest.raises(ValueError, match="identifier"):
        register_format(_make_csvkv("not a name"))
    assert all(p.name != "turtle" for p in registered_formats())


def test_plugin_extraction_end_to_end(spark, csvkv_plugin):
    """A registered plugin is captured into the Arrow-UDF closure: its
    spans route to the plugin parser (fmt column = plugin name), built-in
    spans are untouched, and a raising plugin parser degrades to a
    parse-error skip row."""
    from rdf_dtdl_fabric_ontology_converter_spark.operators.extract import (
        extract_triples, split_errors)
    span = lambda t: {"kind": "text", "text": t, "media_ref": None,  # noqa: E731
                      "offset": 0}
    docs = spark.createDataFrame(
        [("d1", [span("#csvkv\na,b,c\nx,y,z")]),
         ("d2", [span("<http://s> <http://p> <http://o> .")]),
         ("d3", [span("#csvkv\na,b,BOOM")])],
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>")
    clean, errors = split_errors(extract_triples(docs))
    rows = clean.collect()
    by_fmt = {}
    for r in rows:
        by_fmt.setdefault(r["fmt"], []).append((r["subj"], r["pred"],
                                                r["obj"]))
    assert sorted(by_fmt["csvkv"]) == [("a", "b", "c"), ("x", "y", "z")]
    assert by_fmt["turtle"] == [("http://s", "http://p", "http://o")]
    errs = errors.collect()
    assert len(errs) == 1 and "poison row" in errs[0]["reason"] \
        and errs[0]["name"] == "d3"


def test_plan_build_time_snapshot(spark):
    """Registrations AFTER plan build do not affect that plan (the
    documented closure-capture semantics); a rebuilt plan sees them."""
    from rdf_dtdl_fabric_ontology_converter_spark.operators.extract import (
        extract_triples, split_errors)
    span = [{"kind": "text", "text": "#csvkv\na,b,c", "media_ref": None,
             "offset": 0}]
    docs = spark.createDataFrame(
        [("d1", span)],
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>")
    before = extract_triples(docs)   # plan built with NO plugin
    register_format(_make_csvkv())
    try:
        # the pre-registration plan routes the span to the turtle parser
        # (builtin fallback) -> no csvkv rows
        assert before.where("fmt = 'csvkv'").count() == 0
        after = extract_triples(docs)
        assert after.where("fmt = 'csvkv'").count() == 1
    finally:
        unregister_format("csvkv")


def test_entry_point_discovery(monkeypatch):
    """discover_plugins loads FormatPlugins from entry points and skips
    broken ones with a warning (degrade-don't-crash, like the
    reference's manager)."""
    class _EP:
        def __init__(self, name, obj):
            self.name = name
            self._obj = obj

        def load(self):
            if isinstance(self._obj, Exception):
                raise self._obj
            return self._obj

    good = _make_csvkv("epfmt")
    eps = [_EP("good", good), _EP("broken", RuntimeError("nope"))]
    monkeypatch.setattr("importlib.metadata.entry_points",
                        lambda group=None: eps if group ==
                        plug.ENTRY_POINT_GROUP else [])
    try:
        with pytest.warns(UserWarning, match="broken"):
            names = discover_plugins()
        assert names == ["epfmt"]
        reg = {p.name: p for p in registered_formats()}
        assert reg["epfmt"].source == "entry-point:good"
    finally:
        unregister_format("epfmt")
