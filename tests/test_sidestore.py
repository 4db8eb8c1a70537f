"""Arrow-native shared-side stores (state/sidestore.py): the lookup
surface naming consumes, plus the collision-exactness contract."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from osm_jigsaw_ray.state.sidestore import (
    ArrowOsmList,
    ArrowTagStore,
    naming_store_from_taggings,
)


def test_osm_list_roundtrip():
    lists = [("1W", "2R"), ("3W",), (), ("9N", "8W", "7R")]
    l = ArrowOsmList.from_lists(lists)
    assert len(l) == 4
    assert [l[i] for i in range(4)] == [tuple(x) for x in lists]
    assert list(l) == [tuple(x) for x in lists]
    assert l == ArrowOsmList.from_lists([list(x) for x in lists])
    assert not (l == ArrowOsmList.from_lists([("1W",)]))


def test_tag_store_dict_surface():
    d = {
        "1W": {"name": "A", "admin_level": "4"},       # bulk key dropped
        "2R": {"name:de": "B", "boundary": "timezone"},  # excluded pair kept
        "3W": {},
    }
    s = naming_store_from_taggings(d)
    assert len(s) == 3
    assert s.get("1W") == {"name": "A"}
    assert s.get("2R") == {"name:de": "B", "boundary": "timezone"}
    assert s.get("3W") == {}
    assert s.get("9X") is None and s.get("9X", {}) == {}
    assert "1W" in s and "9X" not in s
    assert s["2R"]["name:de"] == "B"
    with pytest.raises(KeyError):
        s["9X"]


def test_tag_store_collision_exactness():
    """Force a hash collision (identical hash buffers) and check the
    probe still returns the exact entry per key: ArrowTagStore verifies
    the key string on the probed run, so collisions cost a compare,
    never a wrong dict."""
    import osm_jigsaw_ray.pipelines.shuffle as shuffle_mod

    orig = shuffle_mod.hash_strings
    shuffle_mod.hash_strings = lambda col: np.zeros(len(col), dtype=np.uint64)
    try:
        ids = pa.array(["aaaa", "bbbb", "cccc"], pa.string())
        keys = pa.array([["name"]] * 3, pa.list_(pa.string()))
        vals = pa.array([["A"], ["B"], ["C"]], pa.list_(pa.string()))
        s = ArrowTagStore(ids, keys, vals)  # built under the zero hash
        assert set(s.hashes) == {0}
        # the REAL _probe: searchsorted finds the full run, the exact
        # key verify picks the right entry out of it
        assert s.get("aaaa") == {"name": "A"}
        assert s.get("bbbb") == {"name": "B"}
        assert s.get("cccc") == {"name": "C"}
        assert s.get("dddd") is None
    finally:
        shuffle_mod.hash_strings = orig


def test_tag_store_unicode_and_long_keys():
    """Keys that take hash_strings' per-row fallback path (non-ascii /
    >64 bytes) still look up exactly."""
    long_key = "w" * 80 + "W"
    d = {
        "üñîW": {"name": "U"},
        long_key: {"name": "L"},
        "1W": {"name": "S"},
    }
    s = naming_store_from_taggings(d)
    assert s.get("üñîW") == {"name": "U"}
    assert s.get(long_key) == {"name": "L"}
    assert s.get("1W") == {"name": "S"}


def test_naming_store_from_dataset_matches_dict(ray_session):
    """Dataset path (distributed projection) == dict path, including
    the hash-sorted layout (__eq__)."""
    import ray.data as rd

    from osm_jigsaw_ray.model import dict_to_tags

    d = {
        "5000W": {"name": "Ways", "wikidata": "Q5"},
        "9000R": {"name:fr": "Rel", "type": "network"},
    }
    tbl = pa.table(
        {
            "osm_id": pa.array(list(d), pa.string()),
            "tags": pa.array(
                [dict_to_tags(t) for t in d.values()],
                pa.list_(
                    pa.struct([("key", pa.string()), ("value", pa.string())])
                ),
            ),
        }
    )
    got = naming_store_from_taggings(rd.from_arrow(tbl))
    assert got == naming_store_from_taggings(d)
    assert got.get("5000W") == {"name": "Ways"}


def test_stores_survive_ray_put_roundtrip(ray_session):
    """The whole point: the stores must come back intact from the
    object store (what every joiner worker does)."""
    import ray

    side = {
        "knn_osm": ArrowOsmList.from_lists([("1W",), ("2R", "3W")]),
        "taggings": naming_store_from_taggings({"1W": {"name": "A"}}),
    }
    back = ray.get(ray.put(side))
    assert back["knn_osm"] == side["knn_osm"]
    assert back["taggings"].get("1W") == {"name": "A"}
    assert back["taggings"].get("2R") is None
