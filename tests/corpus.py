"""Golden input corpus for parity tests.

Payload strings reproduce the reference's pytest fixture inputs verbatim
(reference: tests/fixtures/ttl_fixtures.py:12-170,
tests/fixtures/dtdl_fixtures.py:12-200) — they are the inputs the P/R≥0.95
gate is defined against (BASELINE.json). Expected outputs are encoded in the
tests themselves, from the reference's own assertions
(tests/rdf/test_converter.py, tests/dtdl/test_dtdl.py).
"""

import json

TTL = {}

TTL["simple"] = """
@prefix : <http://example.org/> .
@prefix owl: <http://www.w3.org/2002/07/owl#> .
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .

:Person a owl:Class ;
    rdfs:label "Person" ;
    rdfs:comment "A human being" .

:Organization a owl:Class ;
    rdfs:label "Organization" .

:name a owl:DatatypeProperty ;
    rdfs:domain :Person ;
    rdfs:range xsd:string .

:age a owl:DatatypeProperty ;
    rdfs:domain :Person ;
    rdfs:range xsd:integer .

:worksFor a owl:ObjectProperty ;
    rdfs:domain :Person ;
    rdfs:range :Organization .
"""

TTL["minimal"] = """
@prefix : <http://example.org/> .
@prefix owl: <http://www.w3.org/2002/07/owl#> .
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .

:Person a owl:Class ;
    rdfs:label "Person" .

:name a owl:DatatypeProperty ;
    rdfs:domain :Person ;
    rdfs:range xsd:string .
"""

TTL["inheritance"] = """
@prefix : <http://example.org/> .
@prefix owl: <http://www.w3.org/2002/07/owl#> .
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .

:Animal a owl:Class .
:Mammal a owl:Class ;
    rdfs:subClassOf :Animal .
:Dog a owl:Class ;
    rdfs:subClassOf :Mammal .
"""

TTL["multiple_domains"] = """
@prefix : <http://example.org/> .
@prefix owl: <http://www.w3.org/2002/07/owl#> .
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .

:Person a owl:Class .
:Organization a owl:Class .

:name a owl:DatatypeProperty ;
    rdfs:domain :Person ;
    rdfs:domain :Organization ;
    rdfs:range xsd:string .
"""

TTL["union_domain"] = """
@prefix : <http://example.org/> .
@prefix owl: <http://www.w3.org/2002/07/owl#> .
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .

:Person a owl:Class .
:Organization a owl:Class .

:name a owl:DatatypeProperty ;
    rdfs:domain [
        a owl:Class ;
        owl:unionOf ( :Person :Organization )
    ] ;
    rdfs:range xsd:string .
"""

TTL["restriction"] = """
@prefix owl: <http://www.w3.org/2002/07/owl#> .
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
@prefix ex: <http://example.org/> .

ex:Person a owl:Class ;
    rdfs:subClassOf [
        a owl:Restriction ;
        owl:onProperty ex:age ;
        owl:minCardinality 1
    ] .

ex:age a owl:DatatypeProperty ;
    rdfs:domain ex:Person ;
    rdfs:range xsd:integer .
"""

TTL["functional_property"] = """
@prefix owl: <http://www.w3.org/2002/07/owl#> .
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
@prefix ex: <http://example.org/> .

ex:Person a owl:Class .

ex:ssn a owl:DatatypeProperty, owl:FunctionalProperty ;
    rdfs:domain ex:Person ;
    rdfs:range xsd:string .
"""

TTL["external_import"] = """
@prefix owl: <http://www.w3.org/2002/07/owl#> .
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
@prefix ex: <http://example.org/> .

<http://example.org/ontology> a owl:Ontology ;
    owl:imports <http://xmlns.com/foaf/0.1/> .

ex:Person a owl:Class .
"""

TTL["missing_domain"] = """
@prefix owl: <http://www.w3.org/2002/07/owl#> .
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
@prefix ex: <http://example.org/> .

ex:Person a owl:Class .

ex:name a owl:DatatypeProperty ;
    rdfs:range xsd:string .
"""

TTL["missing_range"] = """
@prefix owl: <http://www.w3.org/2002/07/owl#> .
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
@prefix ex: <http://example.org/> .

ex:Person a owl:Class .

ex:name a owl:DatatypeProperty ;
    rdfs:domain ex:Person .
"""

# rel with missing range (object property): reference skip-reason parity
TTL["rel_missing_range"] = """
@prefix owl: <http://www.w3.org/2002/07/owl#> .
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
@prefix ex: <http://example.org/> .

ex:Person a owl:Class .

ex:knows a owl:ObjectProperty ;
    rdfs:domain ex:Person .
"""

# --------------------------------------------------------------------------
# DTDL payloads (JSON text spans)
# --------------------------------------------------------------------------

_DTDL = {
    "thermostat": {
        "@context": "dtmi:dtdl:context;4",
        "@id": "dtmi:com:example:Thermostat;1",
        "@type": "Interface",
        "displayName": "Thermostat",
        "contents": [
            {"@type": "Property", "name": "targetTemperature", "schema": "double"},
            {"@type": "Telemetry", "name": "currentTemperature", "schema": "double"},
        ],
    },
    "room": {
        "@context": "dtmi:dtdl:context;4",
        "@id": "dtmi:com:example:Room;1",
        "@type": "Interface",
        "displayName": "Room",
        "contents": [
            {"@type": "Property", "name": "name", "schema": "string"},
            {"@type": "Relationship", "name": "hasThermostat",
             "target": "dtmi:com:example:Thermostat;1"},
        ],
    },
    "enum_device": {
        "@context": "dtmi:dtdl:context;4",
        "@id": "dtmi:com:example:Device;1",
        "@type": "Interface",
        "displayName": "Device",
        "contents": [
            {"@type": "Property", "name": "status",
             "schema": {"@type": "Enum", "valueSchema": "string",
                        "enumValues": [
                            {"name": "online", "enumValue": "ONLINE"},
                            {"name": "offline", "enumValue": "OFFLINE"},
                            {"name": "maintenance", "enumValue": "MAINTENANCE"},
                        ]}},
        ],
    },
    "sensor": {
        "@context": "dtmi:dtdl:context;4",
        "@id": "dtmi:com:example:Sensor;1",
        "@type": "Interface",
        "displayName": "Sensor",
        "contents": [
            {"@type": "Telemetry", "name": "temperature", "schema": "double",
             "unit": "degreeCelsius"},
            {"@type": "Telemetry", "name": "humidity", "schema": "double",
             "unit": "percent"},
            {"@type": "Telemetry", "name": "pressure", "schema": "double"},
        ],
    },
    "machine_component": {
        "@context": "dtmi:dtdl:context;4",
        "@id": "dtmi:com:example:Machine;1",
        "@type": "Interface",
        "displayName": "Machine",
        "contents": [
            {"@type": "Property", "name": "serialNumber", "schema": "string"},
            {"@type": "Component", "name": "thermostat",
             "schema": "dtmi:com:example:Thermostat;1"},
        ],
    },
    "smart_thermostat": {
        "@context": "dtmi:dtdl:context;4",
        "@id": "dtmi:com:example:SmartThermostat;1",
        "@type": "Interface",
        "displayName": "Smart Thermostat",
        "extends": "dtmi:com:example:Thermostat;1",
        "contents": [
            {"@type": "Property", "name": "wifiEnabled", "schema": "boolean"},
            {"@type": "Property", "name": "firmwareVersion", "schema": "string"},
        ],
    },
    "nested_objects": {
        "@context": "dtmi:dtdl:context;4",
        "@id": "dtmi:com:example:Building;1",
        "@type": "Interface",
        "displayName": "Building",
        "contents": [
            {"@type": "Property", "name": "address",
             "schema": {"@type": "Object", "fields": [
                 {"name": "street", "schema": "string"},
                 {"name": "city", "schema": "string"},
                 {"name": "country", "schema": "string"},
                 {"name": "coordinates",
                  "schema": {"@type": "Object", "fields": [
                      {"name": "latitude", "schema": "double"},
                      {"name": "longitude", "schema": "double"}]}},
             ]}},
        ],
    },
}

DTDL = {k: json.dumps(v) for k, v in _DTDL.items()}
