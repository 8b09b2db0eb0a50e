"""Oracle-checked mapping pipelines over the TPC-H-ish testdata tables.

Each pipeline is a small mapping spec chosen to exercise one cluster of
reference semantics (SURVEY.md §2.3-§2.7) end-to-end through the Ray
engine, with a DuckDB-SQL oracle that reconstructs the identical triple
table:

* ``customer``  — plain templates, toLower, asDecimal typed literals (M2, F2, F5)
* ``orders``    — slug, asDecimal, date formatting, cross-table URI refs (F6)
* ``part``      — split fan-out: one property → many triples (F7, M12/P5)
* ``nation``    — map_by broadcast lookup + expr + inverse property (J1, F8, M10)
"""

from __future__ import annotations


import pyarrow.parquet as pq

import ray.data

from rdf_mapper_ray.engine.pipeline import KGPipeline

_XSD = "http://www.w3.org/2001/XMLSchema#"
_RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
_G = "urn:x-rdflib:default"
_EX = "http://example.org/def/"

_TRIPLE_SELECT = f"""
SELECT DISTINCT
  '{_G}' AS graph,
  subject,
  'uri' AS subject_kind,
  predicate,
  object_kind,
  object_value,
  CAST(NULL AS VARCHAR) AS lang,
  datatype
FROM triples
ORDER BY graph, subject, predicate, object_kind, object_value
"""


def _run(spec: dict, path: str, columns: list[str]) -> "ray.data.Dataset":
    pipe = KGPipeline(spec, auto_declare=False, canonicalize=False)
    return pipe.run_files(path, columns=columns)


# Materialized-triple-table cache for the BGP query family: several
# queries interrogate the SAME constructed graph (the within-graph
# feeds path+, path-seq, CONSTRUCT and GROUP BY; the customer graph
# feeds OPTIONAL / MINUS / EXISTS), and each bgp_* call would
# otherwise re-run the whole extraction pipeline. The cache holds the
# materialized table per (graph, sf_dir) — blocks stay in the object
# store, every consumer's _pin_triples re-pin is a no-op.
_GRAPH_CACHE: dict = {}


def _cached_graph(key: str, sf_dir: str, build) -> "ray.data.Dataset":
    k = (key, sf_dir)
    if k not in _GRAPH_CACHE:
        _GRAPH_CACHE[k] = build().materialize()
    return _GRAPH_CACHE[k]


# --- customer ---------------------------------------------------------------

CUSTOMER_SPEC = {
    "globals": {"$datasetID": "tpch"},
    "namespaces": {"ex": _EX},
    "resources": [{
        "name": "customer",
        "properties": {
            "@id": "<http://example.org/cust/{c_custkey}>",
            "@type": "<ex:Customer>",
            "<ex:name>": "{c_name}",
            "<ex:segment>": "{c_mktsegment | toLower}",
            "<ex:acctbal>": "{c_acctbal | asDecimal}",
            "<ex:nation>": "<http://example.org/nation/{c_nationkey}>",
        },
    }],
}


def customer_query(sf_dir: str) -> "ray.data.Dataset":
    return _run(CUSTOMER_SPEC, f"{sf_dir}/customer.parquet",
                ["c_custkey", "c_name", "c_mktsegment", "c_acctbal",
                 "c_nationkey"])


CUSTOMER_ORACLE_SQL = f"""
WITH c AS (
  SELECT 'http://example.org/cust/' || CAST(c_custkey AS VARCHAR) AS s, *
  FROM customer
),
triples AS (
  SELECT s AS subject, '{_RDF_TYPE}' AS predicate, 'uri' AS object_kind,
         '{_EX}Customer' AS object_value, NULL AS datatype FROM c
  UNION ALL
  SELECT s, '{_EX}name', 'literal', c_name, NULL FROM c
  UNION ALL
  SELECT s, '{_EX}segment', 'literal', lower(c_mktsegment), NULL FROM c
  UNION ALL
  SELECT s, '{_EX}acctbal', 'literal', CAST(c_acctbal AS VARCHAR),
         '{_XSD}decimal' FROM c
  UNION ALL
  SELECT s, '{_EX}nation', 'uri',
         'http://example.org/nation/' || CAST(c_nationkey AS VARCHAR), NULL
  FROM c
)
{_TRIPLE_SELECT}
"""


# --- orders -----------------------------------------------------------------

ORDERS_SPEC = {
    "globals": {"$datasetID": "tpch"},
    "namespaces": {"ex": _EX},
    "resources": [{
        "name": "order",
        "properties": {
            "@id": "<http://example.org/order/{o_orderkey}>",
            "@type": "<ex:Order>",
            "<ex:status>": "{o_orderstatus}",
            "<ex:price>": "{o_totalprice | asDecimal}",
            "<ex:priority>": "{o_orderpriority | slug}",
            "<ex:customer>": "<http://example.org/cust/{o_custkey}>",
        },
    }],
}


def orders_query(sf_dir: str) -> "ray.data.Dataset":
    return _run(ORDERS_SPEC, f"{sf_dir}/orders.parquet",
                ["o_orderkey", "o_orderstatus", "o_totalprice",
                 "o_orderpriority", "o_custkey"])


ORDERS_ORACLE_SQL = f"""
WITH o AS (
  SELECT 'http://example.org/order/' || CAST(o_orderkey AS VARCHAR) AS s, *
  FROM orders
),
triples AS (
  SELECT s AS subject, '{_RDF_TYPE}' AS predicate, 'uri' AS object_kind,
         '{_EX}Order' AS object_value, NULL AS datatype FROM o
  UNION ALL
  SELECT s, '{_EX}status', 'literal', o_orderstatus, NULL FROM o
  UNION ALL
  SELECT s, '{_EX}price', 'literal', CAST(o_totalprice AS VARCHAR),
         '{_XSD}decimal' FROM o
  UNION ALL
  SELECT s, '{_EX}priority', 'literal',
         replace(lower(o_orderpriority), ' ', '-'), NULL FROM o
  UNION ALL
  SELECT s, '{_EX}customer', 'uri',
         'http://example.org/cust/' || CAST(o_custkey AS VARCHAR), NULL FROM o
)
{_TRIPLE_SELECT}
"""


# --- part (split fan-out) ---------------------------------------------------

PART_SPEC = {
    "globals": {"$datasetID": "tpch"},
    "namespaces": {"ex": _EX},
    "resources": [{
        "name": "part",
        "properties": {
            "@id": "<http://example.org/part/{p_partkey}>",
            "@type": "<ex:Part>",
            "<ex:brand>": "{p_brand}",
            "<ex:size>": "{p_size | asInt}",
            "<ex:typeWord>": "{p_type | split(' ') | toLower}",
        },
    }],
}


def part_query(sf_dir: str) -> "ray.data.Dataset":
    return _run(PART_SPEC, f"{sf_dir}/part.parquet",
                ["p_partkey", "p_brand", "p_size", "p_type"])


PART_ORACLE_SQL = f"""
WITH p AS (
  SELECT 'http://example.org/part/' || CAST(p_partkey AS VARCHAR) AS s, *
  FROM part
),
triples AS (
  SELECT s AS subject, '{_RDF_TYPE}' AS predicate, 'uri' AS object_kind,
         '{_EX}Part' AS object_value, NULL AS datatype FROM p
  UNION ALL
  SELECT s, '{_EX}brand', 'literal', p_brand, NULL FROM p
  UNION ALL
  SELECT s, '{_EX}size', 'literal', CAST(p_size AS VARCHAR),
         '{_XSD}integer' FROM p
  UNION ALL
  SELECT s, '{_EX}typeWord', 'literal', lower(unnest(string_split(p_type, ' '))),
         NULL FROM p
)
{_TRIPLE_SELECT}
"""


# --- lineitem (guard / requires / unless row predicates, 600k rows) ---------

LINEITEM_SPEC = {
    "globals": {"$datasetID": "tpch"},
    "namespaces": {"ex": _EX},
    "resources": [{
        "name": "line",
        # guard: compiled Python predicate over the row (M3)
        "guard": "float(l_quantity) > 10",
        # requires: column must hold one of these values (M4, list form)
        "requires": {"l_returnflag": ["A", "N"]},
        # unless: skip when the column holds this value (M5)
        "unless": {"l_linestatus": "O"},
        "properties": {
            "@id": "<http://example.org/line/{l_orderkey}/{l_linenumber}>",
            "@type": "<ex:LineItem>",
            "<ex:qty>": "{l_quantity | asInt}",
            "<ex:flag>": "{l_returnflag}",
            "<ex:revenue>": "{l_extendedprice | expr('x * (1 - state.get(\"l_discount\"))') | asDecimal}",
            "<ex:order>": "<http://example.org/order/{l_orderkey}>",
        },
    }],
}


def lineitem_query(sf_dir: str) -> "ray.data.Dataset":
    return _run(LINEITEM_SPEC, f"{sf_dir}/lineitem.parquet",
                ["l_orderkey", "l_linenumber", "l_quantity", "l_returnflag",
                 "l_linestatus", "l_extendedprice", "l_discount"])


LINEITEM_ORACLE_SQL = f"""
WITH l AS (
  SELECT 'http://example.org/line/' || CAST(l_orderkey AS VARCHAR) || '/' ||
         CAST(l_linenumber AS VARCHAR) AS s, *
  FROM lineitem
  WHERE l_quantity > 10
    AND l_returnflag IN ('A', 'N')
    AND l_linestatus <> 'O'
),
triples AS (
  SELECT s AS subject, '{_RDF_TYPE}' AS predicate, 'uri' AS object_kind,
         '{_EX}LineItem' AS object_value, NULL AS datatype FROM l
  UNION ALL
  SELECT s, '{_EX}qty', 'literal',
         CAST(CAST(l_quantity AS BIGINT) AS VARCHAR),
         '{_XSD}integer' FROM l
  UNION ALL
  SELECT s, '{_EX}flag', 'literal', l_returnflag, NULL FROM l
  UNION ALL
  SELECT s, '{_EX}revenue', 'literal',
         CAST(l_extendedprice * (1 - l_discount) AS VARCHAR),
         '{_XSD}decimal' FROM l
  UNION ALL
  SELECT s, '{_EX}order', 'uri',
         'http://example.org/order/' || CAST(l_orderkey AS VARCHAR), NULL
  FROM l
)
{_TRIPLE_SELECT}
"""


# --- events (nested resource spec, named graph, native timestamps) ----------

EVENTS_SPEC = {
    "globals": {"$datasetID": "tpch"},
    "namespaces": {"ex": _EX},
    "resources": [
        {
            "name": "event",
            "properties": {
                "@id": "<http://example.org/event/{event_id}>",
                "@type": "<ex:Event>",
                "<ex:ts>": "{ts | asDateTime}",
                "<ex:value>": "{value | asDecimal}",
                "<ex:eventType>": "{event_type}",
                # nested resource spec (M11): the value is itself a
                # resource; its minted URI becomes the property value
                "<ex:props>": {
                    "name": "props",
                    "properties": {
                        "@id": "<http://example.org/event/{event_id}/props>",
                        "<ex:k>": "{k | asInt}",
                    },
                },
            },
        },
        {
            # repeated per event; dedup collapses; lands in a named graph
            "name": "user",
            "@graph": "<http://example.org/graph/users>",
            "properties": {
                "@id": "<http://example.org/user/{user_id}>",
                "@type": "<ex:User>",
            },
        },
    ],
}


def _parse_props(batch):
    """Vectorised JSON-field extract: props '{"k": 12}' -> int column k.
    (The reference reads nested JSON rows natively; our Parquet source
    carries JSON strings, so the explode happens as an Arrow regex
    kernel, not a per-row json.loads.)"""
    import pyarrow.compute as pc
    k = pc.struct_field(
        pc.extract_regex(batch.column("props"), r'"k": (?P<k>-?\d+)'), "k")
    return batch.append_column("k", k)


def events_query(sf_dir: str) -> "ray.data.Dataset":
    import pyarrow.parquet as pq
    pipe = KGPipeline(EVENTS_SPEC, auto_declare=False, canonicalize=False)
    from rdf_mapper_ray.engine.sources import read_parquet_rows
    path = f"{sf_dir}/events.parquet"
    ds = read_parquet_rows(path,
                           columns=["event_id", "ts", "user_id",
                                    "event_type", "value", "props"])
    ds = ds.map_batches(_parse_props, batch_format="pyarrow")
    return pipe.run(ds, rows_hint=pq.read_metadata(path).num_rows)


EVENTS_ORACLE_SQL = f"""
WITH e AS (
  SELECT 'http://example.org/event/' || CAST(event_id AS VARCHAR) AS s,
         'http://example.org/event/' || CAST(event_id AS VARCHAR) || '/props'
           AS props_uri,
         'http://example.org/user/' || CAST(user_id AS VARCHAR) AS user_uri,
         CAST(json_extract(props, '$.k') AS BIGINT) AS k,
         *
  FROM events
),
triples AS (
  SELECT '{_G}' AS graph, s AS subject, '{_RDF_TYPE}' AS predicate,
         'uri' AS object_kind, '{_EX}Event' AS object_value,
         NULL AS datatype FROM e
  UNION ALL
  SELECT '{_G}', s, '{_EX}ts', 'literal',
         strftime(ts, '%Y-%m-%dT%H:%M:%S.%f'), '{_XSD}dateTime' FROM e
  UNION ALL
  SELECT '{_G}', s, '{_EX}value', 'literal', CAST(value AS VARCHAR),
         '{_XSD}decimal' FROM e
  UNION ALL
  SELECT '{_G}', s, '{_EX}eventType', 'literal', event_type, NULL FROM e
  UNION ALL
  SELECT '{_G}', s, '{_EX}props', 'uri', props_uri, NULL FROM e
  UNION ALL
  SELECT '{_G}', props_uri, '{_EX}k', 'literal', CAST(k AS VARCHAR),
         '{_XSD}integer' FROM e
  UNION ALL
  SELECT DISTINCT 'http://example.org/graph/users', user_uri, '{_RDF_TYPE}',
         'uri', '{_EX}User', NULL FROM e
)
SELECT DISTINCT
  graph, subject, 'uri' AS subject_kind, predicate, object_kind,
  object_value, CAST(NULL AS VARCHAR) AS lang, datatype
FROM triples
ORDER BY graph, subject, predicate, object_kind, object_value
"""


# --- events map_to (to_entries + embedded template fan-out) -----------------

EVENTS_MAPTO_SPEC = {
    "globals": {"$datasetID": "tpch"},
    "namespaces": {"ex": _EX},
    # embedded template applied to each to_entries() item (the item list
    # flattens through the pipe, pattern.py P5, so map_to sees each dict
    # and the <parent> URI is {$parentID}/{$resourceID} without an index)
    "embedded": [{
        "name": "kv",
        "properties": {
            "@id": "<parent>",
            "<ex:key>": "{$key}",
            "<ex:val>": "{$value | asInt}",
        },
    }],
    "resources": [{
        "name": "event",
        "properties": {
            "@id": "<http://example.org/event/{event_id}>",
            "<ex:kv>": "{props_obj | to_entries | map_to('kv')}",
        },
    }],
}


def _props_struct(batch):
    """props '{"k": 12}' -> struct<k:int64> column (vectorised regex, no
    per-row json.loads)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    k = pc.cast(pc.struct_field(
        pc.extract_regex(batch.column("props"), r'"k": (?P<k>-?\d+)'), "k"),
        pa.int64())
    if isinstance(k, pa.ChunkedArray):
        k = k.combine_chunks()
    obj = pa.StructArray.from_arrays([k], names=["k"])
    return batch.append_column("props_obj", obj)


def events_mapto_query(sf_dir: str) -> "ray.data.Dataset":
    import pyarrow.parquet as pq
    from rdf_mapper_ray.engine.sources import read_parquet_rows
    pipe = KGPipeline(EVENTS_MAPTO_SPEC, auto_declare=False,
                      canonicalize=False)
    path = f"{sf_dir}/events.parquet"
    ds = read_parquet_rows(path, columns=["event_id", "props"])
    ds = ds.map_batches(_props_struct, batch_format="pyarrow")
    return pipe.run(ds, rows_hint=pq.read_metadata(path).num_rows)


EVENTS_MAPTO_ORACLE_SQL = f"""
WITH e AS (
  SELECT 'http://example.org/event/' || CAST(event_id AS VARCHAR) AS s,
         'http://example.org/event/' || CAST(event_id AS VARCHAR)
            || '/kv' AS kv_uri,
         CAST(json_extract(props, '$.k') AS BIGINT) AS k
  FROM events
),
triples AS (
  SELECT s AS subject, '{_EX}kv' AS predicate, 'uri' AS object_kind,
         kv_uri AS object_value, NULL AS datatype FROM e
  UNION ALL
  SELECT kv_uri, '{_EX}key', 'literal', 'k', NULL FROM e
  UNION ALL
  SELECT kv_uri, '{_EX}val', 'literal', CAST(k AS VARCHAR),
         '{_XSD}integer' FROM e
)
{_TRIPLE_SELECT}
"""


# --- documents with dynamic language tags (P3) ------------------------------

DOCS_LANGTAG_SPEC = {
    "globals": {"$datasetID": "docs"},
    "namespaces": {"ex": _EX},
    "resources": [{
        "name": "doc",
        "properties": {
            "@id": "<http://example.org/doc/{doc_id}>",
            "<ex:text>": "{text}@{lang}",
        },
    }],
}


def docs_langtag_query(sf_dir: str) -> "ray.data.Dataset":
    return _run(DOCS_LANGTAG_SPEC, f"{sf_dir}/documents.parquet",
                ["doc_id", "text", "lang"])


DOCS_LANGTAG_ORACLE_SQL = f"""
WITH d AS (
  SELECT 'http://example.org/doc/' || CAST(doc_id AS VARCHAR) AS s, *
  FROM documents
)
SELECT DISTINCT
  '{_G}' AS graph, s AS subject, 'uri' AS subject_kind,
  '{_EX}text' AS predicate, 'literal' AS object_kind,
  text AS object_value, lang, CAST(NULL AS VARCHAR) AS datatype
FROM d
ORDER BY subject
"""


# --- nation (map_by + expr + inverse property) ------------------------------

def _nation_spec(sf_dir: str) -> dict:
    """map_by's mapping table is spec data (reference doc/doc.md:318-345);
    here it is the small side of a broadcast join, built driver-side from
    the 5-row region table and shipped in the spec closure."""
    region = pq.read_table(f"{sf_dir}/region.parquet")
    mapping = {str(k): v for k, v in
               zip(region.column("r_regionkey").to_pylist(),
                   region.column("r_name").to_pylist())}
    return {
        "globals": {"$datasetID": "tpch"},
        "namespaces": {"ex": _EX},
        "mappings": {"regions": mapping},
        "resources": [{
            "name": "nation",
            "properties": {
                "@id": "<http://example.org/nation/{n_nationkey}>",
                "@type": "<ex:Nation>",
                "<ex:name>": "{n_name}",
                "<ex:regionName>": "{n_regionkey | expr('str(x)') | map_by('regions')}",
                "^<ex:hasNation>": "<http://example.org/region/{n_regionkey}>",
            },
        }],
    }


def nation_query(sf_dir: str) -> "ray.data.Dataset":
    return _run(_nation_spec(sf_dir), f"{sf_dir}/nation.parquet",
                ["n_nationkey", "n_name", "n_regionkey"])


NATION_ORACLE_SQL = f"""
WITH n AS (
  SELECT 'http://example.org/nation/' || CAST(n_nationkey AS VARCHAR) AS s,
         'http://example.org/region/' || CAST(n_regionkey AS VARCHAR) AS region_uri,
         nation.*, region.r_name AS region_name
  FROM nation JOIN region ON nation.n_regionkey = region.r_regionkey
),
triples AS (
  SELECT s AS subject, '{_RDF_TYPE}' AS predicate, 'uri' AS object_kind,
         '{_EX}Nation' AS object_value, CAST(NULL AS VARCHAR) AS datatype
  FROM n
  UNION ALL
  SELECT s, '{_EX}name', 'literal', n_name, NULL FROM n
  UNION ALL
  SELECT s, '{_EX}regionName', 'literal', region_name, NULL FROM n
  UNION ALL
  -- inverse property: (region, hasNation, nation)
  SELECT region_uri, '{_EX}hasNation', 'uri', s, NULL FROM n
)
{_TRIPLE_SELECT}
"""




def _customer_graph_cached(sf_dir: str) -> "ray.data.Dataset":
    """The customer KG extraction, cached per sf_dir for the BGP
    family: four bgp_* queries scan it, and re-extracting per query
    paid ~1.5 s each in the suite. kg_customer (the driver-checked
    extraction query) deliberately does NOT use the cache."""
    return _cached_graph("customer_kg", sf_dir,
                         lambda: customer_query(sf_dir))


def _nation_graph_cached(sf_dir: str) -> "ray.data.Dataset":
    return _cached_graph("nation_kg", sf_dir,
                         lambda: nation_query(sf_dir))


def _orders_graph_cached(sf_dir: str) -> "ray.data.Dataset":
    return _cached_graph("orders_kg", sf_dir,
                         lambda: orders_query(sf_dir))


# --- BGP query over the materialized graph -----------------------------------
# SPARQL-core basic graph pattern evaluated with engine/bgp.py over the
# nation pipeline's triple table: "every region's nations and their
# names" — a path (region -hasNation-> nation) + star (name, type).

def bgp_region_names_query(sf_dir: str) -> "ray.data.Dataset":
    from rdf_mapper_ray.engine.bgp import bgp_match
    trips = _nation_graph_cached(sf_dir)
    return bgp_match(trips, [
        ("?region", f"{_EX}hasNation", "?nation"),
        ("?nation", f"{_EX}name", "?name"),
        ("?nation", _RDF_TYPE, f"{_EX}Nation"),
    ])


BGP_REGION_NAMES_ORACLE_SQL = f"""
WITH trip AS ({NATION_ORACLE_SQL}),
p1 AS (SELECT subject AS region, object_value AS nation FROM trip
       WHERE predicate = '{_EX}hasNation'),
p2 AS (SELECT subject AS nation, object_value AS name FROM trip
       WHERE predicate = '{_EX}name'),
p3 AS (SELECT subject AS nation FROM trip
       WHERE predicate = '{_RDF_TYPE}'
         AND object_value = '{_EX}Nation')
SELECT p1.region, p1.nation, p2.name
FROM p1 JOIN p2 USING (nation) JOIN p3 USING (nation)
ORDER BY region, nation, name
"""


# --- BGP OPTIONAL over a guard-shaped graph ----------------------------------
# SPARQL OPTIONAL needs bindings that genuinely FAIL to match; the
# testdata has no null columns, so the misses come from mapping
# semantics instead: a guarded resource (M3) emits an <ex:tier> triple
# only for customers with acctbal > 5000, and the OPTIONAL group
# left-joins against that sparse property — unmatched customers
# null-extend exactly as SPARQL's left outer join prescribes.

BGP_CUST_GRAPH_SPEC = {
    "globals": {"$datasetID": "tpch"},
    "namespaces": {"ex": _EX},
    "resources": [
        {
            "name": "customer",
            "properties": {
                "@id": "<http://example.org/cust/{c_custkey}>",
                "@type": "<ex:Customer>",
                "<ex:name>": "{c_name}",
                "<ex:segment>": "{c_mktsegment | toLower}",
            },
        },
        {
            "name": "vip",
            "guard": "float(c_acctbal) > 5000",
            "properties": {
                "@id": "<http://example.org/cust/{c_custkey}>",
                "<ex:tier>": "{c_mktsegment | slug}",
            },
        },
    ],
}


def _cust_graph(sf_dir: str) -> "ray.data.Dataset":
    return _cached_graph("cust_graph", sf_dir, lambda: _run(
        BGP_CUST_GRAPH_SPEC, f"{sf_dir}/customer.parquet",
        ["c_custkey", "c_name", "c_mktsegment", "c_acctbal"]))


def bgp_optional_tier_query(sf_dir: str) -> "ray.data.Dataset":
    from rdf_mapper_ray.engine.bgp import bgp_match
    return bgp_match(_cust_graph(sf_dir), [
        ("?c", _RDF_TYPE, f"{_EX}Customer"),
        ("?c", f"{_EX}name", "?name"),
    ], optional=[[("?c", f"{_EX}tier", "?tier")]])


BGP_OPTIONAL_TIER_ORACLE_SQL = f"""
WITH cust AS (
  SELECT 'http://example.org/cust/' || CAST(c_custkey AS VARCHAR) AS c,
         c_name AS name,
         CASE WHEN c_acctbal > 5000
              THEN replace(lower(c_mktsegment), ' ', '-') END AS tier
  FROM customer
)
SELECT c, name, tier FROM cust ORDER BY c
"""


# --- BGP UNION + FILTER over the customer+orders graph -----------------------
# Two arms binding DIFFERENT variable sets (SPARQL bindings are
# partial functions — UNION null-pads), each with its own FILTER:
# building-segment customers UNION high/urgent-priority orders.

def bgp_union_filter_query(sf_dir: str) -> "ray.data.Dataset":
    from rdf_mapper_ray.engine.bgp import bgp_union
    trips = _customer_graph_cached(sf_dir).union(_orders_graph_cached(sf_dir))
    return bgp_union(trips, [
        {"patterns": [("?x", _RDF_TYPE, f"{_EX}Customer"),
                      ("?x", f"{_EX}segment", "?seg")],
         "filters": [("?seg", "==", "building")]},
        {"patterns": [("?x", _RDF_TYPE, f"{_EX}Order"),
                      ("?x", f"{_EX}priority", "?prio")],
         "filters": [("?prio", "~", "high|urgent")]},
    ])


BGP_UNION_FILTER_ORACLE_SQL = """
WITH cust AS (
  SELECT 'http://example.org/cust/' || CAST(c_custkey AS VARCHAR) AS x,
         lower(c_mktsegment) AS seg
  FROM customer WHERE lower(c_mktsegment) = 'building'
),
ords AS (
  SELECT 'http://example.org/order/' || CAST(o_orderkey AS VARCHAR) AS x,
         replace(lower(o_orderpriority), ' ', '-') AS prio
  FROM orders
  WHERE regexp_matches(replace(lower(o_orderpriority), ' ', '-'),
                       'high|urgent')
)
SELECT x, seg, CAST(NULL AS VARCHAR) AS prio FROM cust
UNION ALL
SELECT x, CAST(NULL AS VARCHAR) AS seg, prio FROM ords
ORDER BY x
"""


# --- SPARQL property path: transitive closure of <ex:within> ------------------
# Geographic containment KG: customers sit within nations (customer
# table), nations within regions (nation table); ``?x ex:within+ ?y``
# must surface the DERIVED customer->region pairs alongside the two
# asserted levels — the classic property-path query a flat BGP cannot
# express.

WITHIN_CUST_SPEC = {
    "globals": {"$datasetID": "tpch"},
    "namespaces": {"ex": _EX},
    "resources": [{
        "name": "cust_within",
        "properties": {
            "@id": "<http://example.org/cust/{c_custkey}>",
            "<ex:within>": "<http://example.org/nation/{c_nationkey}>",
        },
    }],
}

WITHIN_NATION_SPEC = {
    "globals": {"$datasetID": "tpch"},
    "namespaces": {"ex": _EX},
    "resources": [{
        "name": "nation_within",
        "properties": {
            "@id": "<http://example.org/nation/{n_nationkey}>",
            "<ex:within>": "<http://example.org/region/{n_regionkey}>",
        },
    }],
}


def _within_graph(sf_dir: str) -> "ray.data.Dataset":
    return _cached_graph("within_graph", sf_dir, lambda: _run(
        WITHIN_CUST_SPEC, f"{sf_dir}/customer.parquet",
        ["c_custkey", "c_nationkey"])
        .union(_run(WITHIN_NATION_SPEC, f"{sf_dir}/nation.parquet",
                    ["n_nationkey", "n_regionkey"])))


def bgp_path_within_query(sf_dir: str) -> "ray.data.Dataset":
    from rdf_mapper_ray.engine.bgp import path_plus
    return path_plus(_within_graph(sf_dir), f"{_EX}within")


BGP_PATH_WITHIN_ORACLE_SQL = """
WITH RECURSIVE e AS (
  SELECT 'http://example.org/cust/' || CAST(c_custkey AS VARCHAR) AS a,
         'http://example.org/nation/' || CAST(c_nationkey AS VARCHAR) AS b
  FROM customer
  UNION ALL
  SELECT 'http://example.org/nation/' || CAST(n_nationkey AS VARCHAR),
         'http://example.org/region/' || CAST(n_regionkey AS VARCHAR)
  FROM nation
),
walk(a, b) AS (
  SELECT a, b FROM e
  UNION
  SELECT w.a, e.b FROM walk w JOIN e ON e.a = w.b
)
SELECT a AS src, b AS dst FROM walk ORDER BY src, dst
"""


def bgp_group_count_query(sf_dir: str) -> "ray.data.Dataset":
    """SPARQL aggregate over the within-graph: customers per region,
    ``SELECT ?r (COUNT(*) AS ?n_customers) WHERE { ?c ex:within ?n .
    ?n ex:within ?r } GROUP BY ?r``."""
    from rdf_mapper_ray.engine.bgp import bgp_group_count
    return bgp_group_count(_within_graph(sf_dir), [
        ("?c", f"{_EX}within", "?n"),
        ("?n", f"{_EX}within", "?r"),
    ], group_var="r", count_name="n_customers")


def bgp_minus_tier_query(sf_dir: str) -> "ray.data.Dataset":
    """SPARQL MINUS (§8.3): customers WITHOUT the guard-sparse
    <ex:tier> property — the negation complement of the OPTIONAL
    query, one distributed anti-join on the shared ?c."""
    from rdf_mapper_ray.engine.bgp import bgp_match
    return bgp_match(_cust_graph(sf_dir), [
        ("?c", _RDF_TYPE, f"{_EX}Customer"),
        ("?c", f"{_EX}name", "?name"),
    ], minus=[[("?c", f"{_EX}tier", "?tier")]])


BGP_MINUS_TIER_ORACLE_SQL = """
SELECT 'http://example.org/cust/' || CAST(c_custkey AS VARCHAR) AS c,
       c_name AS name
FROM customer WHERE NOT (c_acctbal > 5000)
ORDER BY c
"""


def bgp_exists_tier_query(sf_dir: str) -> "ray.data.Dataset":
    """SPARQL FILTER EXISTS: customers that DO carry <ex:tier> — the
    semi-join arm of the negation algebra."""
    from rdf_mapper_ray.engine.bgp import bgp_match
    return bgp_match(_cust_graph(sf_dir), [
        ("?c", _RDF_TYPE, f"{_EX}Customer"),
        ("?c", f"{_EX}name", "?name"),
    ], exists=[[("?c", f"{_EX}tier", "?tier")]])


BGP_EXISTS_TIER_ORACLE_SQL = """
SELECT 'http://example.org/cust/' || CAST(c_custkey AS VARCHAR) AS c,
       c_name AS name
FROM customer WHERE c_acctbal > 5000
ORDER BY c
"""


def bgp_path_seq_query(sf_dir: str) -> "ray.data.Dataset":
    """SPARQL sequence path ``?c <ex:within>/<ex:within> ?r`` over the
    containment graph: exactly the two-hop customer→region pairs (the
    closure query's derived level, without the asserted ones)."""
    from rdf_mapper_ray.engine.bgp import path_seq
    return path_seq(_within_graph(sf_dir),
                    [f"{_EX}within", f"{_EX}within"])


BGP_PATH_SEQ_ORACLE_SQL = """
SELECT DISTINCT
  'http://example.org/cust/' || CAST(c_custkey AS VARCHAR) AS src,
  'http://example.org/region/' || CAST(n_regionkey AS VARCHAR) AS dst
FROM customer JOIN nation ON c_nationkey = n_nationkey
ORDER BY src, dst
"""


def bgp_construct_query(sf_dir: str) -> "ray.data.Dataset":
    """SPARQL CONSTRUCT — derive NEW triples from the containment BGP:
    ``CONSTRUCT { ?r ex:hasCustomer ?c . ?r a ex:PopulatedRegion }
    WHERE { ?c ex:within ?n . ?n ex:within ?r }``. The type triple
    instantiates once per region (set semantics dedup)."""
    from rdf_mapper_ray.engine.bgp import bgp_construct
    return bgp_construct(_within_graph(sf_dir), [
        ("?c", f"{_EX}within", "?n"),
        ("?n", f"{_EX}within", "?r"),
    ], template=[
        ("?r", f"{_EX}hasCustomer", "?c"),
        ("?r", _RDF_TYPE, f"{_EX}PopulatedRegion"),
    ])


BGP_CONSTRUCT_ORACLE_SQL = f"""
WITH b AS (
  SELECT 'http://example.org/cust/' || CAST(c_custkey AS VARCHAR) AS c,
         'http://example.org/region/' || CAST(n_regionkey AS VARCHAR) AS r
  FROM customer JOIN nation ON c_nationkey = n_nationkey
)
SELECT DISTINCT r AS subject, '{_EX}hasCustomer' AS predicate,
       c AS object_value
FROM b
UNION
SELECT DISTINCT r, '{_RDF_TYPE}', '{_EX}PopulatedRegion' FROM b
ORDER BY subject, predicate, object_value
"""


BGP_GROUP_COUNT_ORACLE_SQL = """
SELECT 'http://example.org/region/' || CAST(n_regionkey AS VARCHAR)
         AS r,
       CAST(COUNT(*) AS BIGINT) AS n_customers
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_regionkey ORDER BY r
"""


# --- SPARQL numeric aggregates: account balance stats per nation --------------

def bgp_agg_balance_query(sf_dir: str) -> "ray.data.Dataset":
    """``SELECT ?nat (COUNT(*) ?n) (SUM(?bal)) (AVG(?bal)) (MIN)
    (MAX) WHERE { ?c ex:nation ?nat . ?c ex:acctbal ?bal }
    GROUP BY ?nat`` over the customer graph — numeric aggregation of
    literal objects via the exact-integer cents contract."""
    from rdf_mapper_ray.engine.bgp import bgp_aggregate
    return bgp_aggregate(_customer_graph_cached(sf_dir), [
        ("?c", f"{_EX}nation", "?nat"),
        ("?c", f"{_EX}acctbal", "?bal"),
    ], group_var="nat", value_var="bal")


BGP_AGG_BALANCE_ORACLE_SQL = """
WITH u AS (
  SELECT 'http://example.org/nation/' || CAST(c_nationkey AS VARCHAR)
           AS nat,
         CAST(round(c_acctbal * 100) AS BIGINT) AS v
  FROM customer
)
SELECT nat, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(v) AS BIGINT) AS sum_c,
       CAST(SUM(v) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg,
       CAST(MIN(v) AS BIGINT) AS min_c,
       CAST(MAX(v) AS BIGINT) AS max_c
FROM u GROUP BY nat ORDER BY nat
"""


# --- SPARQL ORDER BY ... LIMIT: richest customers ------------------------------

def bgp_top_balance_query(sf_dir: str, k: int = 20):
    """``SELECT ?c ?bal WHERE { ?c ex:acctbal ?bal } ORDER BY
    DESC(xsd:decimal(?bal)) ?c LIMIT 20``."""
    from rdf_mapper_ray.engine.bgp import bgp_order_limit
    return bgp_order_limit(_customer_graph_cached(sf_dir), [
        ("?c", f"{_EX}acctbal", "?bal"),
    ], order_var="bal", k=k, descending=True, tie_var="c")


BGP_TOP_BALANCE_ORACLE_SQL = """
SELECT 'http://example.org/cust/' || CAST(c_custkey AS VARCHAR) AS c,
       CAST(c_acctbal AS VARCHAR) AS bal
FROM customer
ORDER BY CAST(round(c_acctbal * 100) AS BIGINT) DESC, c
LIMIT 20
"""


# --- SPARQL VALUES + BIND -------------------------------------------------------

def bgp_values_bind_query(sf_dir: str) -> "ray.data.Dataset":
    """``SELECT ?c ?seg ?name ?tag WHERE { ?c ex:segment ?seg .
    ?c ex:name ?name . VALUES ?seg { "building" "machinery" } .
    BIND(CONCAT(?seg, ":", ?name) AS ?tag) }``."""
    from rdf_mapper_ray.engine.bgp import (apply_values, bgp_match,
                                           bind_concat)
    b = bgp_match(_customer_graph_cached(sf_dir), [
        ("?c", f"{_EX}segment", "?seg"),
        ("?c", f"{_EX}name", "?name"),
    ])
    b = apply_values(b, "seg", ["building", "machinery"])
    return bind_concat(b, "tag", ["?seg", ":", "?name"])


BGP_VALUES_BIND_ORACLE_SQL = """
SELECT 'http://example.org/cust/' || CAST(c_custkey AS VARCHAR) AS c,
       lower(c_mktsegment) AS seg, c_name AS name,
       lower(c_mktsegment) || ':' || c_name AS tag
FROM customer
WHERE lower(c_mktsegment) IN ('building', 'machinery')
ORDER BY c
"""


# --- SPARQL ASK ------------------------------------------------------------------

def bgp_ask_query(sf_dir: str):
    """``ASK WHERE { ?c ex:tier ?t . FILTER(?t = "furniture") }``
    over the guard-sparse tier graph (true iff some vip customer is
    in the furniture segment)."""
    from rdf_mapper_ray.engine.bgp import bgp_ask
    return bgp_ask(_cust_graph(sf_dir), [
        ("?c", f"{_EX}tier", "?t"),
    ], filters=[("?t", "==", "furniture")])


BGP_ASK_ORACLE_SQL = """
SELECT EXISTS (
  SELECT 1 FROM customer
  WHERE c_acctbal > 5000
    AND replace(lower(c_mktsegment), ' ', '-') = 'furniture'
) AS ask
"""


# --- SPARQL path alternation + inverse: (within | ^hasNation) -------------------

def bgp_path_alt_query(sf_dir: str) -> "ray.data.Dataset":
    """``SELECT ?src ?dst WHERE { ?src (ex:within | ^ex:hasNation)
    ?dst }`` over the containment graph UNIONed with the nation
    graph: the inverse arm re-derives nation→region pairs from the
    region-side hasNation assertions, and path set semantics dedup
    them against the asserted within edges."""
    from rdf_mapper_ray.engine.bgp import path_alt
    trips = _within_graph(sf_dir).union(_nation_graph_cached(sf_dir))
    return path_alt(trips, predicates=[f"{_EX}within"],
                    inverse_predicates=[f"{_EX}hasNation"])


BGP_PATH_ALT_ORACLE_SQL = """
SELECT DISTINCT src, dst FROM (
  SELECT 'http://example.org/cust/' || CAST(c_custkey AS VARCHAR)
           AS src,
         'http://example.org/nation/' || CAST(c_nationkey AS VARCHAR)
           AS dst
  FROM customer
  UNION ALL
  SELECT 'http://example.org/nation/' || CAST(n_nationkey AS VARCHAR),
         'http://example.org/region/' || CAST(n_regionkey AS VARCHAR)
  FROM nation
) ORDER BY src, dst
"""


def bgp_path_star_query(sf_dir: str) -> "ray.data.Dataset":
    """SPARQL ``?x ex:within* ?y`` — zero-or-more: closure plus the
    identity pairs over the within-graph's nodes."""
    from rdf_mapper_ray.engine.bgp import path_star
    return path_star(_within_graph(sf_dir), f"{_EX}within")


BGP_PATH_STAR_ORACLE_SQL = """
WITH RECURSIVE e AS (
  SELECT 'http://example.org/cust/' || CAST(c_custkey AS VARCHAR) AS a,
         'http://example.org/nation/' || CAST(c_nationkey AS VARCHAR) AS b
  FROM customer
  UNION ALL
  SELECT 'http://example.org/nation/' || CAST(n_nationkey AS VARCHAR),
         'http://example.org/region/' || CAST(n_regionkey AS VARCHAR)
  FROM nation
),
walk(a, b) AS (
  SELECT a, b FROM e
  UNION
  SELECT w.a, e.b FROM walk w JOIN e ON e.a = w.b
),
nodes AS (
  SELECT DISTINCT x AS n FROM (
    SELECT a AS x FROM e UNION ALL SELECT b FROM e)
)
SELECT src, dst FROM (
  SELECT a AS src, b AS dst FROM walk
  UNION
  SELECT n, n FROM nodes
) ORDER BY src, dst
"""


def bgp_negated_pred_query(sf_dir: str) -> "ray.data.Dataset":
    """SPARQL negated property set ``?s !(rdf:type|ex:tier) ?o`` over
    the customer graph — everything except typing and the
    guard-sparse tier (leaves ex:name and ex:segment triples)."""
    from rdf_mapper_ray.engine.bgp import negated_path
    return negated_path(_cust_graph(sf_dir),
                        [_RDF_TYPE, f"{_EX}tier"])


BGP_NEGATED_PRED_ORACLE_SQL = f"""
WITH rows AS (
  SELECT 'http://example.org/cust/' || CAST(c_custkey AS VARCHAR)
           AS src,
         '{_EX}name' AS p, c_name AS dst
  FROM customer
  UNION ALL
  SELECT 'http://example.org/cust/' || CAST(c_custkey AS VARCHAR),
         '{_EX}segment', lower(c_mktsegment)
  FROM customer
)
SELECT src, p, dst FROM rows ORDER BY src, p, dst
"""


# --- SPARQL HAVING: nations whose average balance clears a floor ----------------

def bgp_having_query(sf_dir: str) -> "ray.data.Dataset":
    """``SELECT ?nat (COUNT(*) AS ?n) (SUM(?bal)) (SAMPLE(?c)) WHERE
    { ?c ex:nation ?nat . ?c ex:acctbal ?bal } GROUP BY ?nat HAVING
    (AVG(?bal) > 4500)`` — HAVING evaluated as the exact-integer
    ``sum_cents > 450000·n``; SAMPLE pinned to MIN(?c) (deterministic,
    spec-allowed)."""
    from rdf_mapper_ray.engine.bgp import bgp_having
    return bgp_having(_customer_graph_cached(sf_dir), [
        ("?c", f"{_EX}nation", "?nat"),
        ("?c", f"{_EX}acctbal", "?bal"),
    ], group_var="nat", value_var="bal", sample_var="c",
        avg_floor_units=450_000)


BGP_HAVING_ORACLE_SQL = """
WITH u AS (
  SELECT 'http://example.org/nation/' || CAST(c_nationkey AS VARCHAR)
           AS nat,
         'http://example.org/cust/' || CAST(c_custkey AS VARCHAR)
           AS c,
         CAST(round(c_acctbal * 100) AS BIGINT) AS v
  FROM customer
)
SELECT nat, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(v) AS BIGINT) AS sum_c,
       MIN(c) AS sample
FROM u GROUP BY nat
HAVING SUM(v) > 450000 * COUNT(*)
ORDER BY nat
"""


# --- SPARQL DESCRIBE: customers of one nation -----------------------------------

def bgp_describe_query(sf_dir: str) -> "ray.data.Dataset":
    """``DESCRIBE ?c WHERE { ?c ex:nation <nation/7> }`` — every
    triple about every customer bound to nation 7 (description form
    pinned to subject-triples; see engine/bgp.bgp_describe)."""
    from rdf_mapper_ray.engine.bgp import bgp_describe
    return bgp_describe(_customer_graph_cached(sf_dir), [
        ("?c", f"{_EX}nation", "http://example.org/nation/7"),
    ], var="c")


BGP_DESCRIBE_ORACLE_SQL = f"""
WITH c AS (
  SELECT 'http://example.org/cust/' || CAST(c_custkey AS VARCHAR) AS s, *
  FROM customer WHERE c_nationkey = 7
),
triples AS (
  SELECT s AS subject, '{_RDF_TYPE}' AS predicate,
         '{_EX}Customer' AS object_value FROM c
  UNION ALL
  SELECT s, '{_EX}name', c_name FROM c
  UNION ALL
  SELECT s, '{_EX}segment', lower(c_mktsegment) FROM c
  UNION ALL
  SELECT s, '{_EX}acctbal', CAST(c_acctbal AS VARCHAR) FROM c
  UNION ALL
  SELECT s, '{_EX}nation',
         'http://example.org/nation/' || CAST(c_nationkey AS VARCHAR)
  FROM c
)
SELECT subject, predicate, object_value FROM triples
ORDER BY subject, predicate, object_value
"""


# --- SPARQL 1.1 subquery: customers above their nation's average balance --------

def bgp_subquery_query(sf_dir: str) -> "ray.data.Dataset":
    """``SELECT ?nat ?c ?bal WHERE { ?c ex:nation ?nat .
    ?c ex:acctbal ?bal . { SELECT ?nat (AVG(?b) AS ?avg) WHERE
    { ?x ex:nation ?nat . ?x ex:acctbal ?b } GROUP BY ?nat }
    FILTER(?bal > ?avg) }`` — the sub-SELECT broadcasts (25 rows) and
    the filter cross-multiplies in exact integer cents
    (``bal·n > sum``), zero extra exchanges past the aggregate's own.

    Overflow audit: bal_c ≤ ~1.1e6 × n(customers/nation); wraps only
    past ~8e12 customers per nation."""
    from rdf_mapper_ray.engine.bgp import bgp_filter_above_group_avg
    return bgp_filter_above_group_avg(_customer_graph_cached(sf_dir), [
        ("?c", f"{_EX}nation", "?nat"),
        ("?c", f"{_EX}acctbal", "?bal"),
    ], group_var="nat", value_var="bal")


BGP_SUBQUERY_ORACLE_SQL = """
WITH u AS (
  SELECT 'http://example.org/nation/' || CAST(c_nationkey AS VARCHAR)
           AS nat,
         'http://example.org/cust/' || CAST(c_custkey AS VARCHAR)
           AS c,
         CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c
  FROM customer
),
g AS (
  SELECT nat, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(bal_c) AS BIGINT) AS s
  FROM u GROUP BY nat
)
SELECT u.nat, u.c, u.bal_c
FROM u JOIN g USING (nat)
WHERE u.bal_c * g.n > g.s
ORDER BY u.nat, u.c
"""


# --- SPARQL GROUP_CONCAT: customer roster per nation -----------------------------

def bgp_group_concat_query(sf_dir: str) -> "ray.data.Dataset":
    """``SELECT ?nat (COUNT(*) AS ?n) (GROUP_CONCAT(?name;
    separator=",") AS ?vals) WHERE { ?c ex:nation ?nat .
    ?c ex:name ?name } GROUP BY ?nat`` — deterministic ordered form
    (values ascending)."""
    from rdf_mapper_ray.engine.bgp import bgp_group_concat
    return bgp_group_concat(_customer_graph_cached(sf_dir), [
        ("?c", f"{_EX}nation", "?nat"),
        ("?c", f"{_EX}name", "?name"),
    ], group_var="nat", value_var="name")


BGP_GROUP_CONCAT_ORACLE_SQL = """
SELECT 'http://example.org/nation/' || CAST(c_nationkey AS VARCHAR)
         AS nat,
       CAST(COUNT(*) AS BIGINT) AS n,
       string_agg(c_name, ',' ORDER BY c_name) AS vals
FROM customer
GROUP BY c_nationkey
ORDER BY nat
"""


def bgp_path_range_query(sf_dir: str) -> "ray.data.Dataset":
    """Counted property path ``?s ex:within{2,3} ?o`` over the
    within-graph: everything reachable in exactly 2 or 3 hops
    (customer→region pairs; the graph is 2 deep, so depth 3 is
    provably empty — the oracle unions it anyway)."""
    from rdf_mapper_ray.engine.bgp import path_range
    return path_range(_within_graph(sf_dir), f"{_EX}within",
                      lo=2, hi=3)


BGP_PATH_RANGE_ORACLE_SQL = """
WITH e AS (
  SELECT 'http://example.org/cust/' || CAST(c_custkey AS VARCHAR) AS a,
         'http://example.org/nation/' || CAST(c_nationkey AS VARCHAR)
           AS b
  FROM customer
  UNION ALL
  SELECT 'http://example.org/nation/' || CAST(n_nationkey AS VARCHAR),
         'http://example.org/region/' || CAST(n_regionkey AS VARCHAR)
  FROM nation
),
d1 AS (SELECT DISTINCT a, b FROM e),
d2 AS (SELECT DISTINCT d1.a, e.b FROM d1 JOIN e ON e.a = d1.b),
d3 AS (SELECT DISTINCT d2.a, e.b FROM d2 JOIN e ON e.a = d2.b)
SELECT DISTINCT a AS src, b AS dst
FROM (SELECT * FROM d2 UNION ALL SELECT * FROM d3)
ORDER BY src, dst
"""
