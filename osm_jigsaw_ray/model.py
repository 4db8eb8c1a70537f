"""Core data model: Arrow schemas, OSM id rendering, name-tag selection.

Re-expresses the reference's row-oriented model (SURVEY.md §1) as Arrow
table schemas. Tags are ``list<struct<key,value>>`` (the reference stores
parallel keys[]/values[] arrays, ``outputtagging.proto:5-6``).
"""

from __future__ import annotations

import pyarrow as pa

# --------------------------------------------------------------------------
# Arrow schemas (SURVEY.md §1.4)
# --------------------------------------------------------------------------

TAGS_TYPE = pa.list_(pa.struct([("key", pa.string()), ("value", pa.string())]))

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.large_string()),
        ("lang", pa.string()),
    ]
)

NODES_SCHEMA = pa.schema(
    [
        ("node_id", pa.int64()),
        ("lat", pa.float64()),
        ("lon", pa.float64()),
        ("tags", TAGS_TYPE),
    ]
)

WAYS_SCHEMA = pa.schema(
    [
        ("way_id", pa.int64()),
        ("node_ids", pa.list_(pa.int64())),
        ("tags", TAGS_TYPE),
    ]
)

RELATIONS_SCHEMA = pa.schema(
    [
        ("rel_id", pa.int64()),
        (
            "members",
            pa.list_(
                pa.struct(
                    [("ref", pa.int64()), ("type", pa.string()), ("role", pa.string())]
                )
            ),
        ),
        ("tags", TAGS_TYPE),
    ]
)

AREAS_SCHEMA = pa.schema(
    [
        ("area_id", pa.int64()),
        ("osm_ids", pa.list_(pa.string())),
        ("lats", pa.list_(pa.float64())),
        ("lons", pa.list_(pa.float64())),
        ("area", pa.float64()),
        ("min_lat", pa.float64()),
        ("min_lon", pa.float64()),
        ("max_lat", pa.float64()),
        ("max_lon", pa.float64()),
    ]
)

GRAPH_EDGES_SCHEMA = pa.schema(
    [("parent_area_id", pa.int64()), ("child_area_id", pa.int64())]
)

TAGGINGS_SCHEMA = pa.schema([("osm_id", pa.string()), ("tags", TAGS_TYPE)])


# --------------------------------------------------------------------------
# OSM id rendering / parsing
# --------------------------------------------------------------------------

def osm_id_for(entity_id: int, entity_type: str) -> str:
    """``"<id>" + first letter of type`` — e.g. ``123R``
    (``resolving/EntityOsmId.scala:7-9``). ``entity_type`` in
    {"node", "way", "relation"} or already a single letter."""
    return f"{entity_id}{entity_type[0].upper()}"


def parse_osm_id(osm_id: str) -> tuple[int, str]:
    """Inverse of :func:`osm_id_for`
    (``osm-jigsaw-api/app/model/OsmIdParsing.scala:5-8``)."""
    return int(osm_id[:-1]), osm_id[-1]


# --------------------------------------------------------------------------
# name-tag selection
# --------------------------------------------------------------------------

NAME_TAG_KEYS = ("name:en", "name", "addr:housename")


def has_name(tags: dict[str, str]) -> bool:
    """Any tag key == ``name``, starts with ``name:``, or ==
    ``addr:housename`` (``graphing/EntitiesToGraph.scala:16-18``)."""
    return any(
        k == "name" or k.startswith("name:") or k == "addr:housename" for k in tags
    )


def name_for_tags(tags: dict[str, str]) -> str | None:
    """First of ``name:en``, ``name``, ``addr:housename``
    (``model/EntityRendering.scala:9-23``)."""
    for k in NAME_TAG_KEYS:
        if k in tags:
            return tags[k]
    return None


def name_from_tags_for_language(tags: dict[str, str], encoding: str = "en") -> str | None:
    """Language-preferred name selection
    (``osm-jigsaw-api/app/tags/EntityNameTags.scala:5-21``): if
    ``name:<encoding>`` present use it (shortest wins on duplicates —
    impossible in a dict, kept for parity); else first of ``name``,
    ``addr:housename``."""
    preferred = tags.get("name:" + encoding)
    if preferred is not None:
        return preferred
    for k in ("name", "addr:housename"):
        if k in tags:
            return tags[k]
    return None


def tags_to_dict(tag_list) -> dict[str, str]:
    """``list<struct<key,value>>`` cell (as returned by Arrow ``to_pylist``)
    → dict. Mirrors ``keys.zip(values).toMap`` (``steps/Tiling.scala:36-39``)."""
    if tag_list is None:
        return {}
    return {t["key"]: t["value"] for t in tag_list}


def dict_to_tags(d: dict[str, str]):
    return [{"key": k, "value": v} for k, v in d.items()]
