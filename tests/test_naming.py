"""Naming tests — translate NaiveNamingServiceSpec.scala:15-231 cases
(concatenation order, duplicate removal, overlapping-path merge, excluded
tags, area-size sorting, single-node paths) plus language preference.

Note the reference spec passes area=0.0 for every node, so the ascending
area sort is a stable no-op and the final reverse yields leaf-first names
("Douglas, Middle, Isle of Man"); with real area sizes the same algorithm
emits largest-first. Both behaviors are pinned here.
"""

from osm_jigsaw_ray.model import name_from_tags_for_language
from osm_jigsaw_ray.naming import name_for_paths

TAGS = {
    "1R": {"name": "Australia"},
    "2R": {"name": "Western Australia"},
    "3R": {"name": "Ngaanyatjarra Indigenous Protected Area"},
    "4R": {"name": "Isle of Man"},
    "5R": {"name": "Isle of Man"},  # admin boundary + island: same name
    "6R": {"name": "Middle"},
    "7R": {"name": "Douglas"},
    "8R": {"name": "United States of America"},
    "9R": {"name": "California"},
    "10R": {"name": "Mariposa County"},
    "11R": {"name": "Yosemite National Park"},
    "12R": {"name": "Timezone Zone", "boundary": "timezone"},
    "13R": {"name": "Klein", "name:en": "Small", "name:de": "Kleinburg"},
    "14W": {"name": "Round Pond"},
}


def P(*osm_ids_and_areas):
    return [([o], a) for o, a in osm_ids_and_areas]


def test_concatenation_of_enclosing_area_names():
    # NaiveNamingServiceSpec "place name is a concatenation ..."
    paths = [P(("1R", 0.0), ("2R", 0.0), ("3R", 0.0))]
    assert (
        name_for_paths(paths, TAGS)
        == "Ngaanyatjarra Indigenous Protected Area, Western Australia, Australia"
    )


def test_duplicate_place_names_removed():
    # spec "consecutive duplicated place names ... can be removed"
    paths = [P(("4R", 0.0), ("5R", 0.0), ("6R", 0.0), ("7R", 0.0))]
    assert name_for_paths(paths, TAGS) == "Douglas, Middle, Isle of Man"


def test_overlapping_paths_merge():
    # spec "need to consider overlapping areas": two paths sharing a prefix
    paths = [
        P(("8R", 0.0), ("9R", 0.0), ("10R", 0.0)),
        P(("8R", 0.0), ("9R", 0.0), ("11R", 0.0)),
    ]
    got = name_for_paths(paths, TAGS)
    # merged nodes keep nesting order; both leaves appear
    assert got in (
        "Yosemite National Park, Mariposa County, California, United States of America",
        "Mariposa County, Yosemite National Park, California, United States of America",
    )


def test_excluded_tags_dropped():
    paths = [P(("1R", 0.0), ("12R", 0.0), ("3R", 0.0))]
    got = name_for_paths(paths, TAGS)
    assert "Timezone" not in got
    assert got == "Ngaanyatjarra Indigenous Protected Area, Australia"


def test_single_node_path():
    paths = [P(("1R", 0.0))]
    assert name_for_paths(paths, TAGS) == "Australia"


def test_real_area_sizes_sort_largest_first():
    # with real planar areas the ascending sort + reverse => largest first
    paths = [P(("4R", 500.0), ("6R", 50.0), ("7R", 5.0))]
    assert name_for_paths(paths, TAGS) == "Isle of Man, Middle, Douglas"


def test_unknown_tags_skipped():
    paths = [P(("1R", 0.0), ("zzz", 0.0))]
    assert name_for_paths(paths, TAGS) == "Australia"


def test_language_preference():
    paths = [P(("13R", 5.0))]
    assert name_for_paths(paths, TAGS) == "Small"
    assert name_for_paths(paths, TAGS, requested_language="de") == "Kleinburg"
    assert name_for_paths(paths, TAGS, requested_language="fr") == "Klein"


def test_multi_osm_id_nodes():
    # dedup-merged shapes: one graph node carries two osm ids
    paths = [[(["4R"], 0.0), (["6R", "7R"], 0.0)]]
    assert name_for_paths(paths, TAGS) == "Douglas, Middle, Isle of Man"


def test_name_from_tags_fallbacks():
    assert name_from_tags_for_language({"name": "X", "addr:housename": "Y"}) == "X"
    assert name_from_tags_for_language({"addr:housename": "Y"}) == "Y"
    assert name_from_tags_for_language({"name:en": "E", "name": "X"}) == "E"
    assert name_from_tags_for_language({}) is None


# ---------------------------------------------------------------------------
# naming projection (the slim shared-side tag object)
# ---------------------------------------------------------------------------

def test_project_naming_tags_keeps_exactly_the_naming_surface():
    from osm_jigsaw_ray.naming import project_naming_tags

    tags = {
        "name": "Douglas",
        "name:de": "Duglas",
        "addr:housename": "The Manor",
        "boundary": "timezone",       # an excluded PAIR — kept
        "historic": "castle",         # excluded KEY but non-excluded value — dropped
        "admin_level": "8",           # bulk — dropped
        "wikidata": "Q123",           # bulk — dropped
        "type": "network",            # excluded pair — kept
    }
    assert project_naming_tags(tags) == {
        "name": "Douglas",
        "name:de": "Duglas",
        "addr:housename": "The Manor",
        "boundary": "timezone",
        "type": "network",
    }


def test_projection_is_naming_exact():
    """hypothesis: for random tag dicts (names, excluded pairs, bulk
    noise) and random paths, name_for_paths under the projection equals
    name_for_paths under the full tags — the property that lets the
    shared side carry the projection instead of the 2.3 GB tag table."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from osm_jigsaw_ray.naming import (
        EXCLUDED_TAG_PAIRS,
        name_for_paths,
        project_naming_tags,
    )

    excl = sorted(EXCLUDED_TAG_PAIRS)
    tag_entry = st.one_of(
        st.tuples(
            st.sampled_from(["name", "name:en", "name:de", "addr:housename"]),
            st.text("abcdef ", min_size=0, max_size=6),
        ),
        st.sampled_from(excl),
        # near-miss noise: excluded keys with other values, bulk keys
        st.tuples(
            st.sampled_from(
                ["boundary", "historic", "type", "admin_level", "wikidata", "ele"]
            ),
            st.text("xyz", min_size=1, max_size=4),
        ),
    )
    tags_d = st.dictionaries(st.just(None), st.none(), max_size=0).flatmap(
        lambda _: st.lists(tag_entry, max_size=6).map(dict)
    )
    osm_ids = ["1R", "2R", "3W", "4N"]
    node = st.tuples(
        st.lists(st.sampled_from(osm_ids), min_size=1, max_size=2, unique=True),
        st.floats(0, 100, allow_nan=False),
    )
    paths = st.lists(
        st.lists(node, min_size=1, max_size=3), min_size=1, max_size=3
    )

    @settings(max_examples=200, deadline=None)
    @given(
        tags_for=st.fixed_dictionaries({o: tags_d for o in osm_ids}),
        ps=paths,
        lang=st.sampled_from([None, "en", "de", "fr"]),
    )
    def check(tags_for, ps, lang):
        projected = {o: project_naming_tags(t) for o, t in tags_for.items()}
        assert name_for_paths(ps, projected, lang) == name_for_paths(
            ps, tags_for, lang
        )

    check()
