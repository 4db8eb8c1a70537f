"""Deterministic synthetic fixtures (FIXTURES.md).

Encodes the reference test corpus' *semantics* (nested boxes, overlapping
siblings, multi-ring relations with out-of-order/reversed ways, subarea
roles, cyclic relations, duplicate shapes, unclosed/unnamed ways — per
``osm-jigsaw-parser/src/test``, see SURVEY.md §5) as OSM-style Arrow
tables, plus the Common-Crawl-style ``pages`` corpus of
``BASELINE.json: input_hint``.

Everything is seeded/arithmetic — no RNG state ordering dependence — so
any scale factor reproduces the same leading rows and the DuckDB oracle
can recompute page points from row ids.

Coordinates follow the reference convention x=lat, y=lon; boxes are given
as (lat_min, lat_max, lon_min, lon_max).
"""

from __future__ import annotations

import html as _html

import numpy as np
import pyarrow as pa

from .model import NODES_SCHEMA, RELATIONS_SCHEMA, WAYS_SCHEMA, dict_to_tags

# ---------------------------------------------------------------------------
# fixture geometry catalog
# ---------------------------------------------------------------------------

# name -> (lat_min, lat_max, lon_min, lon_max)
BOXES: dict[str, tuple[float, float, float, float]] = {
    # nested trio + excluded-tag ring between large and medium
    "large": (-10, 10, -10, 10),
    "excluded": (-3, 3, -3, 3),
    "medium": (-2, 2, -2, 2),
    "small": (-1, 1, -1, 1),
    # overlap trio (disjoint from the nested trio)
    "left": (20, 40, -40, -20),
    "right": (20, 40, -20, 0),
    "overlapping": (20, 40, -30, -10),
    "fits_both": (25, 30, -28, -22),
    # duplicate shapes (a closed way and a relation share this exact ring)
    "dup": (50, 55, 10, 15),
    # subarea pair (Bournemouth/Holdenhurst analog)
    "subarea_parent": (60, 65, -5, 0),
    "subarea_child": (61, 62, -4, -3),
    # archipelago rings (one relation, three outer rings)
    "arch_mainland": (-50, -40, 100, 110),
    "arch_island1": (-45, -44, 112, 113),
    "arch_island2": (-48, -47, 114, 115),
    # skewed page cluster target
    "megacity": (30, 31, 120, 121),
    # filtered-out cases
    "unnamed": (70, 72, 50, 52),
    "unclosed": (70, 72, 60, 62),
    # cyclic relation boxes (dropped by expansion, geometry irrelevant)
    "cyclic_a": (70, 72, 70, 72),
    "cyclic_b": (70, 72, 74, 76),
}

# display names + tags per fixture entity
ENTITY_TAGS: dict[str, dict[str, str]] = {
    "large": {"name": "Large", "name:de": "Grossland", "boundary": "administrative"},
    "excluded": {"name": "Timezone Zone", "boundary": "timezone"},
    "medium": {"name": "Medium"},
    "small": {"name": "Klein", "name:en": "Small", "name:de": "Kleinburg"},
    "left": {"name": "Left"},
    "right": {"name": "Right"},
    "overlapping": {"name": "Overlapping"},
    "fits_both": {"addr:housename": "Fits House"},
    "dup_way": {"name": "Dup Way"},
    "dup_rel": {"name": "Dup Rel"},
    "subarea_parent": {"name": "Parentmouth"},
    "subarea_child": {"name": "Holdenchild"},
    "archipelago": {"name": "Archipelago", "name:en": "The Islands"},
    "megacity": {"name": "Megacity", "name:en": "Megacity"},
    "unclosed": {"name": "Open Ridge"},
    "cyclic_a": {"name": "Cycle A"},
    "cyclic_b": {"name": "Cycle B"},
    # unnamed has no tags at all
}


def _box_ring(box):
    """Counter-clockwise ring of 4 corners (closed by repeating first)."""
    lat0, lat1, lon0, lon1 = box
    return [
        (lat0, lon0),
        (lat0, lon1),
        (lat1, lon1),
        (lat1, lon0),
        (lat0, lon0),
    ]


class _Builder:
    def __init__(self):
        self.nodes: list[dict] = []
        self.ways: list[dict] = []
        self.relations: list[dict] = []
        self._next_node = 1000
        self._next_way = 5000
        self._next_rel = 9000
        self._node_at: dict[tuple[float, float], int] = {}

    def node(self, lat, lon, tags=None) -> int:
        key = (float(lat), float(lon))
        if tags is None and key in self._node_at:
            return self._node_at[key]
        nid = self._next_node
        self._next_node += 1
        self.nodes.append(
            {"node_id": nid, "lat": float(lat), "lon": float(lon),
             "tags": dict_to_tags(tags or {})}
        )
        if tags is None:
            self._node_at[key] = nid
        return nid

    def way(self, node_ids, tags=None) -> int:
        wid = self._next_way
        self._next_way += 1
        self.ways.append(
            {"way_id": wid, "node_ids": list(node_ids), "tags": dict_to_tags(tags or {})}
        )
        return wid

    def relation(self, members, tags=None, rel_id=None) -> int:
        rid = rel_id if rel_id is not None else self._next_rel
        self._next_rel = max(self._next_rel, rid) + 1
        self.relations.append(
            {
                "rel_id": rid,
                "members": [
                    {"ref": r, "type": t, "role": role} for (r, t, role) in members
                ],
                "tags": dict_to_tags(tags or {}),
            }
        )
        return rid

    def closed_way_box(self, box, tags) -> int:
        ring = _box_ring(box)
        ids = [self.node(lat, lon) for lat, lon in ring[:-1]]
        return self.way(ids + [ids[0]], tags)

    def box_ways_split(self, box, n_splits=2, reverse_some=True):
        """A box ring split into several ways (for ring-assembly tests);
        returns the way ids in a scrambled order, some reversed."""
        ring = _box_ring(box)
        ids = [self.node(lat, lon) for lat, lon in ring[:-1]]
        ids.append(ids[0])  # closed chain of 5 node ids
        # split the 4-edge chain into way segments
        cuts = {1: [5], 2: [3, 5], 3: [2, 4, 5]}[n_splits if n_splits in (1, 2, 3) else 2]
        segs = []
        start = 0
        for c in cuts:
            segs.append(ids[start:c])
            start = c - 1
        way_ids = []
        for i, seg in enumerate(segs):
            if reverse_some and i % 2 == 1:
                seg = list(reversed(seg))
            way_ids.append(self.way(seg))
        # scramble order deterministically
        return list(reversed(way_ids))


def build_osm_fixture_tables() -> dict[str, pa.Table]:
    """The full fixture catalog → ``{"nodes": .., "ways": .., "relations": ..}``."""
    b = _Builder()

    # --- simple named closed-way boxes
    simple = ["large", "excluded", "medium", "small", "left", "right",
              "overlapping", "fits_both", "megacity"]
    for name in simple:
        b.closed_way_box(BOXES[name], ENTITY_TAGS[name])

    # --- unnamed closed way (filtered out by entities_to_graph)
    b.closed_way_box(BOXES["unnamed"], {})

    # --- named but unclosed way (ignored by area resolver)
    lat0, lat1, lon0, lon1 = BOXES["unclosed"]
    n1 = b.node(lat0, lon0)
    n2 = b.node(lat0, lon1)
    n3 = b.node(lat1, lon1)
    b.way([n1, n2, n3], ENTITY_TAGS["unclosed"])

    # --- duplicate shapes: same ring as a closed way and as a relation
    dup_way_id = b.closed_way_box(BOXES["dup"], ENTITY_TAGS["dup_way"])
    dup_outer = b.box_ways_split(BOXES["dup"], n_splits=1, reverse_some=False)
    # dup relation reuses the *same* corner nodes → identical ring
    b.relation(
        [(w, "way", "outer") for w in dup_outer], ENTITY_TAGS["dup_rel"]
    )

    # --- archipelago: one relation, three rings, ways out of order + reversed
    arch_ways = []
    arch_ways += b.box_ways_split(BOXES["arch_mainland"], n_splits=3)
    arch_ways += b.box_ways_split(BOXES["arch_island1"], n_splits=2)
    arch_ways += b.box_ways_split(BOXES["arch_island2"], n_splits=1, reverse_some=False)
    # interleave ways across rings so assembly must search
    order = sorted(range(len(arch_ways)), key=lambda i: (i * 7) % len(arch_ways))
    b.relation(
        [(arch_ways[i], "way", "outer") for i in order], ENTITY_TAGS["archipelago"]
    )

    # --- subarea pair: child relation is both standalone and a subarea member
    child_outer = b.box_ways_split(BOXES["subarea_child"], n_splits=2)
    child_rel = b.relation(
        [(w, "way", "outer") for w in child_outer], ENTITY_TAGS["subarea_child"]
    )
    parent_outer = b.box_ways_split(BOXES["subarea_parent"], n_splits=2)
    b.relation(
        [(w, "way", "outer") for w in parent_outer]
        + [(child_rel, "relation", "subarea")],
        ENTITY_TAGS["subarea_parent"],
    )

    # --- cyclic pair (relation expansion must drop both and record them)
    ca_outer = b.box_ways_split(BOXES["cyclic_a"], n_splits=1, reverse_some=False)
    cb_outer = b.box_ways_split(BOXES["cyclic_b"], n_splits=1, reverse_some=False)
    rid_a, rid_b = 9500, 9501
    b.relation(
        [(w, "way", "outer") for w in ca_outer] + [(rid_b, "relation", "")],
        ENTITY_TAGS["cyclic_a"],
        rel_id=rid_a,
    )
    b.relation(
        [(w, "way", "outer") for w in cb_outer] + [(rid_a, "relation", "")],
        ENTITY_TAGS["cyclic_b"],
        rel_id=rid_b,
    )

    return {
        "nodes": pa.Table.from_pylist(b.nodes, schema=NODES_SCHEMA),
        "ways": pa.Table.from_pylist(b.ways, schema=WAYS_SCHEMA),
        "relations": pa.Table.from_pylist(b.relations, schema=RELATIONS_SCHEMA),
    }


# ---------------------------------------------------------------------------
# pages corpus (input_hint schema) — arithmetic point mixture, SQL-replayable
# ---------------------------------------------------------------------------

HTML_PREFIX = (
    '<html><head><meta charset="utf-8">'
    '<meta name="geo.position" content="'
)
# full template:
#   {PREFIX}{lat!r};{lon!r}"><title>p</title></head>
#   <body><article>{escaped text}</article></body></html>

_LANGS = ("en", "de", "fr", "es")

# mixture thresholds over u = ((i*2654435761 + 12345) mod 2^32) / 2^32
# (megacity gets >=30% to exercise hot-cell salting, FIXTURES.md §1.1)
_MIX = [
    ("megacity", 0.35),
    ("small", 0.50),       # interior of the nested trio
    ("medium_band", 0.60),  # inside medium but outside small
    ("fits_both", 0.70),    # overlap region
    ("left_only", 0.80),    # inside left, outside overlapping
    ("arch", 0.90),         # archipelago mainland
    ("ocean", 1.01),        # no containing area -> kNN fallback
]


def page_points(ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic (lat, lon) per page id — pure integer arithmetic so a
    SQL oracle can reproduce it exactly (see ``__ray_entry__.oracle_sql``)."""
    i = np.asarray(ids, dtype=np.int64)
    u = ((i * 2654435761 + 12345) % 4294967296).astype(np.float64) / 4294967296.0
    ju = ((i * 97 + 13) % 1000).astype(np.float64) / 1000.0   # jitter u in [0,1)
    jv = ((i * 193 + 29) % 1000).astype(np.float64) / 1000.0  # jitter v in [0,1)
    lat = np.zeros(i.shape, dtype=np.float64)
    lon = np.zeros(i.shape, dtype=np.float64)

    def place(mask, box, pad=0.1):
        lat0, lat1, lon0, lon1 = box
        lat[mask] = lat0 + pad + ju[mask] * (lat1 - lat0 - 2 * pad)
        lon[mask] = lon0 + pad + jv[mask] * (lon1 - lon0 - 2 * pad)

    prev = 0.0
    for kind, hi in _MIX:
        mask = (u >= prev) & (u < hi)
        prev = hi
        if kind == "megacity":
            place(mask, BOXES["megacity"], pad=0.05)
        elif kind == "small":
            place(mask, BOXES["small"])
        elif kind == "medium_band":
            # inside medium, lat in (1.2, 1.8) keeps it outside small+excluded? no:
            # excluded covers medium entirely; band is outside *small* only
            lat[mask] = 1.2 + ju[mask] * 0.6
            lon[mask] = -1.8 + jv[mask] * 3.6
        elif kind == "fits_both":
            place(mask, BOXES["fits_both"])
        elif kind == "left_only":
            # inside left (lon -40..-20) but outside overlapping (lon > -30)
            lat[mask] = 21.0 + ju[mask] * 18.0
            lon[mask] = -39.0 + jv[mask] * 8.0
        elif kind == "arch":
            place(mask, BOXES["arch_mainland"], pad=0.5)
        else:  # ocean
            lat[mask] = 80.0 + ju[mask] * 5.0
            lon[mask] = 160.0 + jv[mask] * 15.0
    return lat, lon


_WORDS = (
    "harbour market bridge castle river garden square tower abbey quay "
    "meadow forest cliff valley lighthouse station museum theatre"
).split()


def page_text(i: int) -> str:
    w1 = _WORDS[i % len(_WORDS)]
    w2 = _WORDS[(i * 7 + 3) % len(_WORDS)]
    return f"Page {i} describes the {w1} near the {w2} district."


def render_html(i: int, lat: float, lon: float, text: str) -> bytes:
    return (
        f'{HTML_PREFIX}{lat!r};{lon!r}"><title>p{i}</title></head>'
        f"<body><article>{_html.escape(text)}</article></body></html>"
    ).encode("utf-8")


def generate_pages(n: int, start_id: int = 0, filler_kb: int = 0) -> pa.Table:
    """``pages`` table rows [start_id, start_id+n) in the input_hint
    schema — fully vectorized (Arrow string kernels), so the synthetic
    corpus generates at parquet-read-like speed inside Ray tasks.

    Arrow's float→string cast is shortest-round-trip like Python's
    ``repr``, so the geo-resolver recovers the exact float64 point; the
    synthetic texts contain no HTML-special characters, so the escape in
    :func:`render_html` is an identity and extracted text stays
    byte-identical.
    """
    import pyarrow.compute as pc

    ids = np.arange(start_id, start_id + n, dtype=np.int64)
    lat, lon = page_points(ids)
    ids_str = pc.cast(pa.array(ids), pa.string())
    words = np.asarray(_WORDS)
    w1 = pa.array(words[ids % len(words)])
    w2 = pa.array(words[(ids * 7 + 3) % len(words)])
    j = pc.binary_join_element_wise
    texts = j(
        "Page ", ids_str, " describes the ", w1, " near the ", w2, " district.", ""
    )
    urls = j("https://example.org/p/", pc.utf8_lpad(ids_str, 8, "0"), "")
    lat_s = pc.cast(pa.array(lat), pa.string())
    lon_s = pc.cast(pa.array(lon), pa.string())
    # filler paragraphs OUTSIDE <article> make the html payload realistic
    # (real Common-Crawl pages are tens of KB of boilerplate around the
    # extractable text) without touching the byte-identical-text invariant
    filler = (
        "<p>" + " ".join(_WORDS) + " " + " ".join(reversed(_WORDS)) + "</p>"
    )
    boiler = filler * max(0, int(filler_kb * 1024) // len(filler))
    htmls = j(
        HTML_PREFIX,
        lat_s,
        ";",
        lon_s,
        '"><title>p',
        ids_str,
        "</title></head><body><nav>",
        boiler,
        "</nav><article>",
        texts,
        "</article><footer>",
        boiler,
        "</footer></body></html>",
        "",
    )
    ts = pa.array(
        (np.datetime64("2025-01-01T00:00:00", "us") + ids.astype("timedelta64[s]")),
        type=pa.timestamp("us"),
    )
    return pa.table(
        {
            "url": urls,
            "warc_ts": ts,
            "html": pc.cast(htmls, pa.binary()),
            "text": pc.cast(texts, pa.large_string()),
            "lang": pa.array(np.asarray(_LANGS)[ids % 4]),
        }
    )


def synthetic_nodes_table(n: int, tag_every: int = 100) -> pa.Table:
    """Deterministic n-node OSM nodes table (engine schema) — the scale
    fixture for pbf codec benchmarks. Every ``tag_every``-th node carries
    a name tag; coordinates land on the 1e-7° grid so a pbf round-trip
    is exact."""
    ids = np.arange(1, n + 1, dtype=np.int64)
    lat = np.round(-90.0 + (ids * 7919 % 1_800_000) / 10_000.0, 7)
    lon = np.round(-180.0 + (ids * 104729 % 3_600_000) / 10_000.0, 7)
    tags = [
        [{"key": "name", "value": f"Node {i}"}] if i % tag_every == 0 else []
        for i in range(1, n + 1)
    ]
    from .model import TAGS_TYPE

    return pa.table(
        {
            "node_id": pa.array(ids, pa.int64()),
            "lat": pa.array(lat, pa.float64()),
            "lon": pa.array(lon, pa.float64()),
            "tags": pa.array(tags, TAGS_TYPE),
        }
    )


def synthetic_area_catalog(n: int, seed: int = 42, ring_points: int = 64) -> pa.Table:
    """Deterministic n-area synthetic catalog (densified rectangle rings,
    log-uniform spans 0.01°–8°) in the engine's canonical areas schema —
    the scale fixture for tile-assignment / graph-build benchmarks where
    the 15-box test catalog is too small to measure anything."""
    rng = np.random.default_rng(seed)
    la0 = rng.uniform(-75.0, 74.0, n)
    lo0 = rng.uniform(-175.0, 174.0, n)
    span = np.exp(rng.uniform(np.log(0.01), np.log(8.0), n))
    la1 = np.minimum(la0 + span, 80.0)
    lo1 = np.minimum(lo0 + span * 1.3, 179.0)
    k = max(1, ring_points // 4)
    t = np.linspace(0.0, 1.0, k, endpoint=False)
    lats_col, lons_col = [], []
    for i in range(n):
        dla, dlo = la1[i] - la0[i], lo1[i] - lo0[i]
        lats_col.append(
            np.concatenate(
                [np.full(k, la0[i]), la0[i] + dla * t, np.full(k, la1[i]), la1[i] - dla * t]
            )
        )
        lons_col.append(
            np.concatenate(
                [lo0[i] + dlo * t, np.full(k, lo1[i]), lo1[i] - dlo * t, np.full(k, lo0[i])]
            )
        )
    return pa.table(
        {
            "area_id": pa.array(np.arange(n), pa.int64()),
            "osm_ids": pa.array([[f"way/{i}"] for i in range(n)], pa.list_(pa.string())),
            "lats": pa.array(lats_col, pa.list_(pa.float64())),
            "lons": pa.array(lons_col, pa.list_(pa.float64())),
            "area": pa.array((la1 - la0) * (lo1 - lo0), pa.float64()),
            "min_lat": pa.array(la0),
            "min_lon": pa.array(lo0),
            "max_lat": pa.array(la1),
            "max_lon": pa.array(lo1),
        }
    )
