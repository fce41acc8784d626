"""Golden-corpus parity gate over the reference's shipped sample files.

Pins this engine's behavior on every sample the reference tests itself on:
21 RDF serializations (reference tests/rdf/test_rdf_formats.py:446-576:
per-file parse + cross-serialization consistency on sample_iot_ontology.*),
the supply-chain pipeline structure (tests/rdf/test_converter.py:372-400),
14 DTDL models, and all 26 CDM pack files (tests/cdm/test_cdm_samples.py).

Counts/names below were produced by this engine's parsers and are pinned as
regression anchors; the reference-mirrored assertions (common entities,
locatedAt relationship, ≥3 supply-chain entities, CDM pack entity sets)
come straight from the reference's own test expectations. Skipped when the
reference checkout isn't present (the repo stays standalone).
"""

import base64
import json
import pathlib

import pytest

SAMPLES = pathlib.Path("/root/reference/samples")

pytestmark = pytest.mark.skipif(
    not SAMPLES.exists(), reason="reference samples not available")

# --- pinned: filename -> (sniffed format, triples parsed) ------------------
RDF_PINNED = {
    "ecommerce_catalog.jsonld": ("jsonld", 19),
    "ecommerce_ontology.ttl": ("turtle", 133),
    "event_schema.jsonld": ("jsonld", 17),
    "geography_ontology.ttl": ("turtle", 144),
    "healthcare_ontology.ttl": ("turtle", 138),
    "library_ontology.ttl": ("turtle", 148),
    "music_ontology.ttl": ("turtle", 90),
    "pizza_ontology.ttl": ("turtle", 65),
    "sample_fibo_ontology.ttl": ("turtle", 684),
    "sample_foaf_ontology.ttl": ("turtle", 234),
    "sample_iot_ontology.jsonld": ("jsonld", 63),
    "sample_iot_ontology.n3": ("turtle", 65),
    "sample_iot_ontology.nq": ("turtle", 42),   # 42 = exact statement count
    "sample_iot_ontology.nt": ("turtle", 46),   # 46 = exact statement count
    "sample_iot_ontology.rdf": ("rdfxml", 46),
    "sample_iot_ontology.trig": ("turtle", 47),
    "sample_iot_ontology.ttl": ("turtle", 46),
    "sample_supply_chain_ontology.ttl": ("turtle", 153),
    "simple_person.jsonld": ("jsonld", 8),
    "university_ontology.ttl": ("turtle", 89),
    "vehicle_ontology.ttl": ("turtle", 92),
}

# --- pinned: per-serialization pipeline output (each serialization
# intentionally differs in content; the shared subset is Device/Location +
# locatedAt, which is exactly what the reference asserts) -------------------
IOT_PINNED = {
    ".jsonld": (["Building", "Device", "Location", "SmartMeter"],
                ["locatedAt"]),
    ".n3": (["Controller", "Device", "Location", "Zone"],
            ["controls", "locatedAt"]),
    ".nq": (["Device", "Gateway", "Location"], ["locatedAt"]),
    ".nt": (["Actuator", "Device", "Location"], ["locatedAt"]),
    ".rdf": (["Device", "Location", "Sensor"], ["locatedAt"]),
    ".trig": (["Device", "EdgeDevice", "Location"], ["locatedAt"]),
    ".ttl": (["Device", "Location"], ["locatedAt"]),
}

# --- pinned: DTDL interfaces per model file --------------------------------
DTDL_PINNED = {
    "dtdl_v2_energy": ["Battery", "Inverter", "SolarPanel"],
    "dtdl_v2_fleet": ["Driver", "ServiceCenter", "Vehicle"],
    "dtdl_v2_smartbuilding": ["Building", "Floor", "Room", "Sensor"],
    "dtdl_v3_logistics": ["LoadingDock", "Rack", "Warehouse", "Zone"],
    "dtdl_v3_retail": ["Checkout", "Section", "Shelf", "Store"],
    "dtdl_v3_smartfarm": ["Farm", "Field", "SoilSensor", "WeatherStation"],
    "dtdl_v4_datacenter": ["CoolingSystem", "DataCenter", "DataHall",
                           "Server", "ServerRack"],
    "dtdl_v4_hospital": ["Department", "Hospital", "MedicalEquipment",
                         "PatientRoom"],
    "dtdl_v4_transportation": ["Station", "TransitLine", "TransitNetwork",
                               "TransitVehicle"],
    "factory": ["Factory"],
    "machine": ["Machine"],
    "product": ["Product"],
    "production_line": ["ProductionLine"],
    "thermostat": ["Thermostat"],
}

# --- pinned: CDM pack -> (entity names, relationship names). Matches the
# reference parser semantics: manifest rels keep their manifest names;
# model.json emits rels only from attributeReference entries (none in these
# samples), never from the top-level SingleKeyRelationship array -----------
CDM_PACKS = {
    "simple": (["Category", "Contact", "Order", "OrderLine", "Person",
                "Product", "Supplier"],
               ["OrderBelongsToPerson", "OrderLineInOrder",
                "OrderShipsToContact", "PersonHasContact"]),
    "model-json/OrdersProducts": (["Category", "Customer", "Order",
                                   "OrderDetail", "Product"], []),
    "industry/automotive": (["Dealer", "Lead", "ServiceAppointment",
                             "Vehicle"],
                            ["LeadDealer", "ServiceVehicle",
                             "VehicleDealer"]),
    "industry/education": (["Course", "Enrollment", "Institution",
                            "Student"],
                           ["EnrollmentCourse", "EnrollmentStudent",
                            "StudentInstitution"]),
    "industry/financial-services": (["Account", "Customer", "Loan",
                                     "Transaction"],
                                    ["AccountCustomer", "LoanCustomer",
                                     "TransactionAccount"]),
    "industry/healthcare": (["Appointment", "Encounter", "Patient",
                             "Practitioner"],
                            ["AppointmentPatient", "AppointmentPractitioner",
                             "EncounterPatient", "EncounterPractitioner"]),
}


@pytest.mark.parametrize("fname", sorted(RDF_PINNED))
def test_rdf_sample_file_parses(fname):
    """Every reference RDF sample parses cleanly with a pinned triple count
    (mirrors reference test_all_format_sample_files)."""
    from rdf_dtdl_fabric_ontology_converter_spark.operators.extract import (
        _parse_span)
    text = (SAMPLES / "rdf" / fname).read_text()
    fmt, rows, err = _parse_span(text)
    assert err is None, f"{fname}: {err}"
    exp_fmt, exp_n = RDF_PINNED[fname]
    assert (fmt, len(rows)) == (exp_fmt, exp_n)


def test_iot_cross_serialization_consistency(spark):
    """All 7 serializations of sample_iot_ontology run through the full
    pipeline; the shared entity subset must contain Device and Location and
    every serialization must emit locatedAt (mirrors reference
    test_format_consistency_across_serializations /
    test_relationship_parsing_across_formats)."""
    from rdf_dtdl_fabric_ontology_converter_spark.plans.pipeline import (
        build_graph, triples_from_documents)
    from rdf_dtdl_fabric_ontology_converter_spark.sources.documents import (
        docs_from_payloads)
    common = None
    for f in sorted(SAMPLES.glob("rdf/sample_iot_ontology.*")):
        docs = docs_from_payloads(spark, {f.suffix[1:]: f.read_text()})
        tp, sk = triples_from_documents(docs)
        res = build_graph(spark, tp, sk)
        ents = sorted(r["name"] for r in res.entity_types.collect())
        rels = sorted(r["name"] for r in res.relationship_types.collect())
        exp_ents, exp_rels = IOT_PINNED[f.suffix]
        assert ents == exp_ents, f"{f.name}: {ents}"
        assert rels == exp_rels, f"{f.name}: {rels}"
        assert "locatedAt" in rels
        common = set(ents) if common is None else common & set(ents)
    assert common is not None and {"Device", "Location"} <= common


def test_supply_chain_definition_structure(spark):
    """sample_supply_chain_ontology.ttl through pipeline + definition sink
    (mirrors reference test_sample_ontology_ttl structure assertions)."""
    from rdf_dtdl_fabric_ontology_converter_spark.plans.pipeline import (
        build_graph, triples_from_documents)
    from rdf_dtdl_fabric_ontology_converter_spark.sources.documents import (
        docs_from_payloads)
    from rdf_dtdl_fabric_ontology_converter_spark.sources.sinks import (
        create_definition)
    text = (SAMPLES / "rdf" / "sample_supply_chain_ontology.ttl").read_text()
    docs = docs_from_payloads(spark, {"sc": text})
    tp, sk = triples_from_documents(docs)
    res = build_graph(spark, tp, sk)
    definition = create_definition(res.entity_types, res.relationship_types)
    parts = definition["parts"]
    assert [p["path"] for p in parts if p["path"] == ".platform"] \
        == [".platform"]
    entity_parts = [p for p in parts if "EntityTypes" in p["path"]]
    # the reference test asserts >= 3 entity parts (its "Equipment, Sensor,
    # Facility" comment is stale — the sample's actual classes are below)
    assert len(entity_parts) >= 3
    names = set()
    for p in entity_parts:
        payload = json.loads(base64.b64decode(p["payload"]).decode())
        assert "id" in payload and "name" in payload \
            and "namespace" in payload
        names.add(payload["name"])
    assert {"Supplier", "Facility", "Product", "Shipment",
            "PurchaseOrder", "Warehouse", "Customer"} <= names


def test_dtdl_sample_models(spark):
    """All 14 DTDL sample models extract + convert with pinned per-file
    interface sets and no skipped items."""
    from rdf_dtdl_fabric_ontology_converter_spark.operators.dtdl import (
        DtdlModes, convert_interfaces, extract_interfaces)
    from rdf_dtdl_fabric_ontology_converter_spark.sources.documents import (
        docs_from_payloads)
    payloads = {f.stem: f.read_text()
                for f in sorted(SAMPLES.glob("dtdl/*.json"))}
    assert len(payloads) == 14
    docs = docs_from_payloads(spark, payloads)
    iface = extract_interfaces(docs)
    by_doc: dict[str, set] = {}
    for r in iface.select("doc_id", "name").collect():
        by_doc.setdefault(r["doc_id"], set()).add(r["name"])
    assert {k: sorted(v) for k, v in by_doc.items()} == DTDL_PINNED
    ents, rels, skips = convert_interfaces(iface, DtdlModes())
    assert skips.count() == 0
    n_ifaces = sum(len(v) for v in DTDL_PINNED.values())
    assert ents.count() == n_ifaces
    rel_names = {r["name"] for r in rels.collect()}
    assert {"hasFloor", "hasRoom", "connectedTo", "produces",
            "belongsToFactory"} <= rel_names


@pytest.mark.parametrize("pack", sorted(CDM_PACKS))
def test_cdm_sample_pack(spark, pack):
    """Each CDM pack (manifest + entity schemas / model.json) converts to
    the pinned entity and relationship sets (mirrors reference
    tests/cdm/test_cdm_samples.py)."""
    from rdf_dtdl_fabric_ontology_converter_spark.operators.cdm import (
        convert_cdm, extract_cdm)
    from rdf_dtdl_fabric_ontology_converter_spark.sources.documents import (
        docs_from_payloads)
    d = SAMPLES / "cdm" / pack
    payloads = {f.stem: f.read_text() for f in sorted(d.glob("*.json"))}
    docs = docs_from_payloads(spark, payloads)
    e_rows, r_rows = extract_cdm(docs)
    ce, cr, _sk = convert_cdm(e_rows, r_rows)
    exp_ents, exp_rels = CDM_PACKS[pack]
    assert sorted(r["name"] for r in ce.collect()) == exp_ents
    assert sorted(r["name"] for r in cr.collect()) == exp_rels
