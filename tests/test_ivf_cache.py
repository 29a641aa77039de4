"""The IVF index cache key and its keep-last-4 pruning.

`_ivf_index_path` is the guard between "build-once / probe-many" and
"silently serve a stale index": the cache key must MISS whenever the
embeddings data, the build params, or the quantizer code change
(otherwise the probe query serves results from the OLD quantizer while
the SQL oracle recomputes with the new one and the gate reds on
correct code), and the prune must bound the cache to a handful of
corpus copies without ever deleting the live fingerprint. Pure
filesystem tests — no Spark session.
"""

from __future__ import annotations

import os

from pyspark_data_engineering_assignment_spark.plans.vector_queries import (

    _ivf_index_path,
)

import pytest  # noqa: E402

pytestmark = pytest.mark.slow


def _mk_sf_dir(tmp_path, content: bytes = b"parquet-bytes") -> str:
    sf = tmp_path / "sf"
    sf.mkdir(exist_ok=True)
    (sf / "embeddings.parquet").write_bytes(content)
    return str(sf)


def test_key_is_deterministic(tmp_path):
    sf = _mk_sf_dir(tmp_path)
    scratch = str(tmp_path / "cache")
    a = _ivf_index_path(sf, params="p", scratch_root=scratch)
    b = _ivf_index_path(sf, params="p", scratch_root=scratch)
    assert a == b
    assert os.path.dirname(a) == scratch


def test_key_misses_on_param_change(tmp_path):
    sf = _mk_sf_dir(tmp_path)
    scratch = str(tmp_path / "cache")
    a = _ivf_index_path(sf, params="n_cells=8", scratch_root=scratch)
    b = _ivf_index_path(sf, params="n_cells=16", scratch_root=scratch)
    assert a != b


def test_key_misses_on_data_change(tmp_path):
    """Regenerating the embeddings at the SAME path must miss the cache
    — the exact stale-index hazard the content fingerprint exists for."""
    sf = _mk_sf_dir(tmp_path, b"v1")
    scratch = str(tmp_path / "cache")
    a = _ivf_index_path(sf, scratch_root=scratch)
    # same byte length, different mtime (regeneration bumps mtime even
    # when sizes collide)
    os.utime(os.path.join(sf, "embeddings.parquet"), ns=(1, 1))
    b = _ivf_index_path(sf, scratch_root=scratch)
    assert a != b
    # different size too
    (tmp_path / "sf" / "embeddings.parquet").write_bytes(b"v2-longer")
    c = _ivf_index_path(sf, scratch_root=scratch)
    assert c not in (a, b)


def test_key_misses_on_quantizer_code_change(tmp_path, monkeypatch):
    """Changing the training code must miss the cache: the fingerprint
    folds in inspect.getsource of both clustering entry points."""
    from pyspark_data_engineering_assignment_spark.operators import clustering

    sf = _mk_sf_dir(tmp_path)
    scratch = str(tmp_path / "cache")
    a = _ivf_index_path(sf, scratch_root=scratch)

    def other_quantizer():  # different source text is all that matters
        return "changed"

    monkeypatch.setattr(clustering, "kmeans_fixedpoint", other_quantizer)
    b = _ivf_index_path(sf, scratch_root=scratch)
    assert a != b


def test_prune_keeps_last_three_stale_plus_current(tmp_path):
    sf = _mk_sf_dir(tmp_path)
    scratch = tmp_path / "cache"
    scratch.mkdir()
    # six stale fingerprints with strictly increasing mtimes
    stale = []
    for i in range(6):
        d = scratch / f"ivf_index_stale{i:02d}"
        d.mkdir()
        os.utime(d, ns=(i * 1_000, i * 1_000))
        stale.append(d.name)
    current = _ivf_index_path(sf, scratch_root=str(scratch))
    left = sorted(p.name for p in scratch.iterdir())
    # the three most-recent stale dirs survive, the three oldest are gone
    assert [n for n in left if n.startswith("ivf_index_stale")] == stale[3:]
    # the helper only computes the live path; creation is the builder's
    # job, so it must not appear among the survivors
    assert os.path.basename(current) not in left


def test_prune_spares_recently_touched_stale_dirs(tmp_path):
    """Age threshold (round-8 ADVICE low): keep-last-N alone could
    delete an index a CONCURRENT session is actively probing the moment
    extra fingerprints appear. A stale dir touched within the last hour
    is never pruned, regardless of how many newer fingerprints exist."""
    import time

    sf = _mk_sf_dir(tmp_path)
    scratch = tmp_path / "cache"
    scratch.mkdir()
    now = time.time()
    fresh = scratch / "ivf_index_freshstale"
    fresh.mkdir()  # natural mtime = now: inside the 1h grace window
    old = []
    for i in range(6):
        d = scratch / f"ivf_index_oldstale{i:02d}"
        d.mkdir()
        os.utime(d, (now - 7200 - i, now - 7200 - i))  # > 1h old
        old.append(d)
    _ivf_index_path(sf, scratch_root=str(scratch))
    assert fresh.is_dir(), "prune deleted a stale dir inside the grace window"
    # old-enough dirs beyond keep-last-3 are still reclaimed
    assert sum(d.is_dir() for d in old) < 6


def test_prune_matches_fingerprint_token_exactly(tmp_path):
    """The live-fingerprint exclusion compares the 16-hex token exactly,
    not by string prefix: a foreign fingerprint that happens to extend
    the current one must still be prunable, and the current token with
    any variant suffix must be protected."""
    sf = _mk_sf_dir(tmp_path)
    scratch = tmp_path / "cache"
    scratch.mkdir()
    current = _ivf_index_path(sf, scratch_root=str(scratch))
    fp = os.path.basename(current)[len("ivf_index_"):]
    impostor = scratch / f"ivf_index_{fp}0"  # prefix-extends the token
    impostor.mkdir()
    os.utime(impostor, (0, 0))
    for i in range(4):
        d = scratch / f"ivf_index_oldstale{i:02d}"
        d.mkdir()
        os.utime(d, (1000 + i, 1000 + i))
    _ivf_index_path(sf, scratch_root=str(scratch))
    assert not impostor.is_dir(), "prefix-extending impostor escaped the prune"


def test_prune_spares_current_det_sibling(tmp_path):
    """ann_ivf_probe_topk appends "_det" to the returned path; the
    prune's exact-token exclusion must protect that sibling
    (it IS the live index directory)."""
    sf = _mk_sf_dir(tmp_path)
    scratch = tmp_path / "cache"
    scratch.mkdir()
    current = _ivf_index_path(sf, scratch_root=str(scratch))
    det = current + "_det"
    os.makedirs(det)
    os.utime(det, ns=(0, 0))  # older than everything else
    for i in range(6):
        d = scratch / f"ivf_index_stale{i:02d}"
        d.mkdir()
        os.utime(d, ns=((i + 1) * 1_000, (i + 1) * 1_000))
    _ivf_index_path(sf, scratch_root=str(scratch))
    assert os.path.isdir(det), "prune deleted the live _det index"


def test_cache_hit_refreshes_grace_window(tmp_path):
    """Reading an index never bumps its dir mtime, so a >1h-old index
    under active probe was still prune-eligible to OTHER sessions; the
    path helper must utime the current dir on every hit so live readers
    keep refreshing the 1h grace window (round-9 ADVICE low)."""
    sf = _mk_sf_dir(tmp_path)
    scratch = str(tmp_path / "cache")
    cur = _ivf_index_path(sf, params="p", scratch_root=scratch)
    os.makedirs(cur)
    two_h_ago = __import__("time").time() - 7200
    os.utime(cur, (two_h_ago, two_h_ago))
    det = cur + "_det"  # the variant dir the probe query actually reads
    os.makedirs(det)
    os.utime(det, (two_h_ago, two_h_ago))
    assert _ivf_index_path(sf, params="p", scratch_root=scratch) == cur
    # the hit refreshed mtime: the dirs are young again, outside the
    # stale-prune cutoff another session would apply
    assert os.path.getmtime(cur) > two_h_ago + 3600
    assert os.path.getmtime(det) > two_h_ago + 3600
