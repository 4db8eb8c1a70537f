"""Naive naming (C9): enclosing-area paths → a single place-name string.

Pure-function re-implementation of
``osm-jigsaw-api/app/naming/NaiveNamingService.scala:12-111`` — the
merge/ordering behavior is pinned by the reference's
``NaiveNamingServiceSpec`` cases (SURVEY.md §5), which our tests mirror:

* nodes carrying any denylisted tag pair are dropped,
* multiple root→leaf paths merge via adjacent-pair insertion preserving
  nesting order,
* merged nodes sort by ascending area,
* names resolve per requested language (``name:<lang>``; fallback
  ``name`` → ``addr:housename``),
* consecutive duplicate names collapse,
* the result joins largest-last reversed with ", "
  (e.g. "Douglas, Middle, Isle of Man").
"""

from __future__ import annotations

from .model import name_from_tags_for_language

# ``TagsWhichDoNotContributeToLocationNames``
# (NaiveNamingService.scala:12-37) — 24 key/value pairs.
EXCLUDED_TAG_PAIRS: frozenset[tuple[str, str]] = frozenset(
    {
        ("boundary", "civil_defense"),
        ("boundary", "diocese"),
        ("boundary", "eez"),
        ("boundary", "fire"),
        ("boundary", "fire_district"),
        ("boundary", "historic"),
        ("boundary", "historic_parish"),
        ("boundary", "maritime"),
        ("boundary", "military_district"),
        ("boundary", "low_emission_zone"),
        ("boundary", "police"),
        ("boundary", "public_transport"),
        ("boundary", "proposed"),
        ("boundary", "timezone"),
        ("boundary", "vice_county"),
        ("historic", "yes"),
        ("boundary", "historic_administrative"),
        ("boundary", "historic_political"),
        ("political_division", "historical_local_const"),
        ("political_division", "euro_const"),
        ("political_division", "local_const"),
        ("public_transport", "pay_scale_area"),
        ("type", "network"),
        ("type", "toll"),
    }
)

_ROOT = "-1R"  # synthetic root osm id prepended to every path

# every tag key naming can read: name selection consumes ``name:<lang>``
# (any language), ``name`` and ``addr:housename``
# (model.name_from_tags_for_language); the exclusion filter consumes the
# 24 exact (key, value) pairs above. Nothing else in a tag dict can
# influence a name string.
_NAMING_PLAIN_KEYS = frozenset({"name", "addr:housename"})


def project_naming_tags(tags: dict[str, str]) -> dict[str, str]:
    """The naming-relevant projection of a tag dict: ``name``/``name:*``/
    ``addr:housename`` plus any tag that IS one of the 24 excluded
    (key, value) pairs. Exact for naming by construction —
    ``name_for_paths(paths, {o: project_naming_tags(t)}) ==
    name_for_paths(paths, {o: t})`` for every input (pinned by
    ``tests/test_naming.py``) — while dropping the boundary geometry /
    admin-level / wiki* bulk that makes the planet tag table 2.3 GB
    (``osm-jigsaw-parser/README.md:129-134``). This is what lets the
    partitioned/tiled joins carry GLOBAL naming metadata (the kNN
    fallback names a globally-nearest area, so some global naming side
    is semantically irreducible) at slim-array cost instead of
    rehydrating the full tag table per worker."""
    return {
        k: v
        for k, v in tags.items()
        if k in _NAMING_PLAIN_KEYS
        or k.startswith("name:")
        or (k, v) in EXCLUDED_TAG_PAIRS
    }


def has_excluded_tags(tags: dict[str, str]) -> bool:
    return any((k, v) in EXCLUDED_TAG_PAIRS for k, v in tags.items())


def name_for_paths(
    paths: list[list[tuple[list[str], float]]],
    tags_for: dict[str, dict[str, str]],
    requested_language: str | None = None,
) -> str:
    """``paths``: each path is a root→leaf list of graph nodes, each node a
    ``(osm_ids, area)`` tuple (a node may carry several osm ids after exact
    dedup merged identical shapes). ``tags_for`` maps osm_id → tag dict.
    """
    lang = requested_language or "en"

    # 1. prepend synthetic root; drop excluded-tag osm ids; drop empty nodes
    filtered: list[list[list[str]]] = []
    for path in paths:
        full = [([_ROOT], 0.0)] + list(path)
        fpath = []
        for osm_ids, _area in full:
            kept = [o for o in osm_ids if not has_excluded_tags(tags_for.get(o, {}))]
            if kept:
                fpath.append(kept)
        filtered.append(fpath)

    # 2. merge paths into a graph of adjacent (previous, current) pairs,
    #    first-seen order preserved (NaiveNamingService.scala:58-76)
    adjacent_pairs: list[tuple[str, str]] = []
    for fpath in filtered:
        stack: list[str] = []
        for node in fpath:
            for osm_id in node:
                if stack:
                    pair = (stack[-1], osm_id)
                    if pair not in adjacent_pairs:
                        adjacent_pairs.append(pair)
                stack.append(osm_id)

    # 3. fold pairs into one sequence via insert-after-predecessor
    #    (NaiveNamingService.scala:78-90); drop the synthetic root
    combined: list[str] = []
    for first, second in adjacent_pairs:
        if second not in combined:
            try:
                insert_at = combined.index(first) + 1
            except ValueError:
                combined.extend([first, second])
            else:
                combined.insert(insert_at, second)
    combined = combined[1:]

    # 4. sort by ascending area (last-wins map like Scala .toMap; stable sort)
    area_of: dict[str, float] = {}
    for path in paths:
        for osm_ids, area in path:
            for o in osm_ids:
                area_of[o] = area
    combined.sort(key=lambda o: area_of.get(o, 0.0))

    # 5. resolve names, drop unnamed
    names = []
    for osm_id in combined:
        tags = tags_for.get(osm_id)
        if tags is None:
            continue
        name = name_from_tags_for_language(tags, lang)
        if name is not None:
            names.append(name)

    # 6. global first-occurrence dedup, then reverse-join
    deduped: list[str] = []
    for n in names:
        if n not in deduped:
            deduped.append(n)
    return ", ".join(reversed(deduped))
