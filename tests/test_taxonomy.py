import pyarrow as pa
import pytest

from fscrawler_ray.state.taxonomy import Taxonomy


def build():
    t = Taxonomy()
    t.add("media")
    t.add("photos", "media", min_age=3)
    t.add("family", "photos")
    t.add("games", "media", min_age=12)
    t.add("shooters", "games", min_age=16)
    return t


def test_materialized_paths_and_depth():
    t = build()
    assert t.materialized_path("family") == "/media/photos/family"
    assert t.depth("media") == 1
    assert t.depth("shooters") == 3


def test_effective_min_age_restricts_down():
    t = build()
    assert t.effective_min_age("shooters") == 16
    assert t.effective_min_age("games") == 12
    assert t.effective_min_age("family") == 3


def test_subtree_mask_vectorized():
    t = build()
    tbl = t.to_table()
    mask = t.subtree_mask(tbl, "games")
    picked = tbl.filter(mask).column("name").to_pylist()
    assert picked == ["games", "shooters"]
    # 'photos' subtree does not leak into 'games'
    mask2 = t.subtree_mask(tbl, "photos")
    assert tbl.filter(mask2).column("name").to_pylist() == ["family", "photos"]


def test_duplicate_and_missing_parent():
    t = build()
    with pytest.raises(ValueError):
        t.add("media")
    with pytest.raises(KeyError):
        t.add("x", "nope")
