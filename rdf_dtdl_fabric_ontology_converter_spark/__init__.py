"""PySpark-native knowledge-graph construction engine.

From-scratch reimplementation of the conversion semantics of
``falloutxAY/rdf-dtdl-fabric-ontology-converter`` (RDF / DTDL / CDM ->
Fabric-style ontology graph) as distributed Spark operators:

    documents (Iceberg/Parquet, interleaved text+media spans)
      -> triple extraction (Arrow-vectorized span parsers)
      -> classification + class-expression resolution (broadcast + iterative joins)
      -> entity / relationship materialization (windows + salted aggregations)
      -> canonicalization (CURIE expansion, sameAs union-find, sort-merge dedup)
      -> vertex/edge tables + Fabric definition JSON

Everything is pyspark.sql DataFrame + pandas/Arrow UDFs; no per-row Python
in the hot path; no rdflib on executors.
"""

__version__ = "0.1.0"

NAMESPACE = "usertypes"
NAMESPACE_TYPE = "Custom"
VISIBILITY = "Visible"

# Well-known IRIs (public W3C namespaces)
RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDFS_NS = "http://www.w3.org/2000/01/rdf-schema#"
OWL_NS = "http://www.w3.org/2002/07/owl#"
XSD_NS = "http://www.w3.org/2001/XMLSchema#"

RDF_TYPE = RDF_NS + "type"
RDF_PROPERTY = RDF_NS + "Property"
RDF_FIRST = RDF_NS + "first"
RDF_REST = RDF_NS + "rest"
RDF_NIL = RDF_NS + "nil"
RDFS_CLASS = RDFS_NS + "Class"
RDFS_SUBCLASS_OF = RDFS_NS + "subClassOf"
RDFS_DOMAIN = RDFS_NS + "domain"
RDFS_RANGE = RDFS_NS + "range"
RDFS_LABEL = RDFS_NS + "label"
RDFS_COMMENT = RDFS_NS + "comment"
OWL_CLASS = OWL_NS + "Class"
OWL_DATATYPE_PROPERTY = OWL_NS + "DatatypeProperty"
OWL_OBJECT_PROPERTY = OWL_NS + "ObjectProperty"
OWL_UNION_OF = OWL_NS + "unionOf"
OWL_INTERSECTION_OF = OWL_NS + "intersectionOf"
OWL_COMPLEMENT_OF = OWL_NS + "complementOf"
OWL_ONE_OF = OWL_NS + "oneOf"
OWL_ONTOLOGY = OWL_NS + "Ontology"
OWL_IMPORTS = OWL_NS + "imports"
OWL_RESTRICTION = OWL_NS + "Restriction"
OWL_SAME_AS = OWL_NS + "sameAs"
OWL_EQUIVALENT_CLASS = OWL_NS + "equivalentClass"

# Fabric hard limits (reference: src/constants.py:154-208)
MAX_ENTITY_TYPES = 500
MAX_RELATIONSHIP_TYPES = 500
MAX_PROPERTIES_PER_ENTITY = 200
MAX_ENTITY_ID_PARTS = 5
MAX_DEFINITION_BYTES = 1_000_000
MAX_INHERITANCE_DEPTH = 10
MAX_EXTENDS_DEPTH = 12  # DTDL (reference: dtdl_validator.py:159)

ID_PREFIX = 1_000_000_000_000  # reference: src/shared/utilities/id_generator.py:20
