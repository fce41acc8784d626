"""Third-party span-format plugins (§2.10 plugin protocol).

Reference parity: the reference discovers ontology plugins from setuptools
entry points and registers them by format name (reference:
src/plugins/manager.py:434-460, ENTRY_POINT_GROUP
'fabric_ontology.plugins' at manager.py:70). This engine's equivalent is a
SPAN-FORMAT plugin: a (name, sniffer, parser) triple that extends the
extraction dispatch — the reference's extension-based lookup becomes
content sniffing because span payloads have no filenames.

Spark execution model (the part the reference, being single-process,
never had to solve): dispatch runs inside the Arrow extraction UDF on
EXECUTORS, whose module state is separate from the driver's. Runtime
registrations therefore do NOT propagate via module globals; instead
``operators.extract.extract_triples`` snapshots the registered plugin
list at PLAN BUILD TIME and cloudpickle ships the sniffer/parser
callables inside the UDF closure. Consequences a plugin author must know:

- callables must be picklable (top-level functions or importable
  classes; no open sockets/files in closures);
- registrations made AFTER a DataFrame was built do not affect that
  DataFrame — rebuild the plan;
- entry-point plugins (installed packages) work with spark-submit
  --py-files/--packages like any code dependency.

Parser contract: ``parser(text) -> list of 7-tuples``
(subj, pred, obj, obj_kind, obj_datatype, lang, graph_ctx) — the same
shape every built-in span parser returns; raise to produce a parse-error
skip row. Sniffer contract: ``sniffer(text) -> bool``; custom sniffers
run BEFORE the built-in format inference, in registration order, so a
plugin can claim content the built-ins would misroute.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

ENTRY_POINT_GROUP = "rdf_dtdl_fabric_ontology_converter_spark.formats"


@dataclass(frozen=True)
class FormatPlugin:
    """A third-party span format: emitted in the ``fmt`` column as
    ``name``; see the module docstring for the callable contracts."""
    name: str
    sniffer: Callable[[str], bool]
    parser: Callable[[str], list]
    # provenance for error messages / listings ("builtin-registration",
    # "entry-point:<dist>", ...)
    source: str = field(default="registered", compare=False)


_REGISTRY: dict[str, FormatPlugin] = {}
_BUILTIN_FMTS = {"turtle", "jsonld", "rdfxml", "trix", "hext", "rdfa",
                 "microdata", "dtdl", "cdm", "empty"}


def register_format(plugin: FormatPlugin) -> None:
    """Register (or replace) a plugin. Built-in format names are
    reserved — shadowing the turtle parser silently would corrupt every
    corpus, so it raises."""
    if plugin.name in _BUILTIN_FMTS:
        raise ValueError(
            f"format name {plugin.name!r} is a built-in and cannot be "
            f"overridden by a plugin")
    if not plugin.name or not plugin.name.isidentifier():
        raise ValueError(f"plugin format name must be an identifier, "
                         f"got {plugin.name!r}")
    _REGISTRY[plugin.name] = plugin


def unregister_format(name: str) -> bool:
    return _REGISTRY.pop(name, None) is not None


def registered_formats() -> tuple[FormatPlugin, ...]:
    """Snapshot of registered plugins in registration order — this exact
    tuple is what extract_triples captures into the UDF closure."""
    return tuple(_REGISTRY.values())


def discover_plugins(group: str = ENTRY_POINT_GROUP) -> list[str]:
    """Load plugins from installed-package entry points (the reference's
    discovery path, manager.py:434-460). Each entry point's ``load()``
    must return a FormatPlugin or an iterable of them. Returns the names
    registered; a plugin that fails to load is skipped with a warning
    (same degrade-don't-crash policy as the reference's manager)."""
    import warnings
    try:
        from importlib.metadata import entry_points
    except ImportError:  # pragma: no cover
        return []
    registered = []
    try:
        eps = entry_points(group=group)
    except TypeError:  # pragma: no cover - pre-3.10 signature
        eps = entry_points().get(group, [])
    for ep in eps:
        try:
            loaded = ep.load()
            plugs = loaded if isinstance(loaded, (list, tuple)) else [loaded]
            for p in plugs:
                register_format(FormatPlugin(
                    p.name, p.sniffer, p.parser,
                    source=f"entry-point:{ep.name}"))
                registered.append(p.name)
        except Exception as e:  # noqa: BLE001
            warnings.warn(f"format plugin entry point {ep.name!r} failed "
                          f"to load: {type(e).__name__}: {e}",
                          stacklevel=2)
    return registered
