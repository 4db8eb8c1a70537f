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
