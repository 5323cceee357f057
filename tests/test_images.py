"""Image payload invariants (BASELINE.json input_hint + per-row
invariant: decoded-pixel exactness for lossless fmts, caption
equality, phash recompute)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from s2spark import images as IM


def test_codec_roundtrips():
    rng = np.random.default_rng(3)
    for w, h in [(8, 8), (16, 32), (32, 16)]:
        arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        assert (IM.raw_decode(IM.raw_encode(arr), w, h) == arr).all()
        assert (IM.png_decode(IM.png_encode(arr)) == arr).all()
        assert IM.psnr(arr, arr) == float("inf")


def test_lossy_codec_psnr():
    """qzl is genuinely lossy but stays above the 40 dB per-row
    invariant; deterministic; decode bits == quantized encode bits."""
    rng = np.random.default_rng(4)
    for w, h in [(8, 8), (16, 32), (32, 16)]:
        arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        dec = IM.qzl_decode(IM.qzl_encode(arr), w, h)
        assert not (dec == arr).all()                 # lossy for real
        p = IM.psnr(arr, dec)
        assert IM.PSNR_MIN_DB <= p < float("inf")
        assert np.abs(dec.astype(int) - arr.astype(int)).max() \
            <= 1 << (IM.QUANT_BITS - 1)
        assert IM.qzl_encode(arr) == IM.qzl_encode(arr)  # deterministic


def test_phash_properties():
    a = IM._pixels_for(5, 32, 32)
    b = IM._pixels_for(900001, 32, 32)
    ha, hb = IM.phash64(a), IM.phash64(b)
    assert ha == IM.phash64(a)  # deterministic
    # a tiny perturbation keeps the hash close (hamming <= 12/64)
    noisy = a.copy().astype(np.int16)
    noisy[0, 0] += 3
    hn = IM.phash64(np.clip(noisy, 0, 255).astype(np.uint8))
    assert bin((ha ^ hn) & ((1 << 64) - 1)).count("1") <= 12


def test_unsupported_codec_is_stubbed():
    with pytest.raises(NotImplementedError):
        IM.decode(b"", "jpeg", 8, 8)


def test_pipeline_invariants(spark):
    """BASELINE.json per-row invariant over a mixed lossless/lossy
    population: every row pixel_ok (exact for raw/png, PSNR >= 40 dB
    for qzl), phash exact-recompute for lossless, caption survives
    byte-identical."""
    imgs = IM.synth_images(spark, 300)
    v = IM.verify_images(imgs).collect()
    assert len(v) == 300
    assert all(r["pixel_ok"] for r in v)
    assert all(r["phash_ok"] for r in v)
    lossless = [r for r in v if r["psnr"] == 1e9]
    lossy = [r for r in v if r["psnr"] < 1e9]
    assert len(lossless) == 200 and len(lossy) == 100  # 1/3 qzl
    assert all(r["phash_ham"] == 0 for r in lossless)
    assert all(IM.PSNR_MIN_DB <= r["psnr"] for r in lossy)
    caps = {r["image_id"]: r["caption"] for r in v}
    src = {r["image_id"]: r["caption"]
           for r in imgs.select("image_id", "caption").collect()}
    assert caps == src


def test_image_tile_stats(spark):
    imgs = IM.synth_images(spark, 400)
    stats = IM.image_tile_stats(imgs, level=4).collect()
    assert sum(r["n_images"] for r in stats) == 400
    assert all(len(r["tile_token"]) <= 3 for r in stats)
    # hot-city skew fixture shows up: some tile has >> mean images
    counts = sorted(r["n_images"] for r in stats)
    assert counts[-1] >= 3 * (400 / max(len(stats), 1))


def test_bytes_pruned_when_not_needed(spark):
    """column pruning: a query that doesn't decode must not read
    bytes (scan ReadSchema excludes the binary column)."""
    import os
    import tempfile
    imgs = IM.synth_images(spark, 50)
    path = os.path.join(tempfile.mkdtemp(), "imgs.parquet")
    imgs.write.mode("overwrite").parquet(path)
    df = spark.read.parquet(path).groupBy("fmt").count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "bytes" not in plan.split("ReadSchema")[1][:200]


def test_resize_nn_kernel():
    """exact NN semantics: identity at same size; 2x downscale picks
    the center-of-pixel source; upscale repeats pixels."""
    a = IM._pixels_for(9, 16, 8)
    assert (IM.resize_nn(a, 16, 8) == a).all()
    down = IM.resize_nn(a, 8, 4)
    assert down.shape == (4, 8, 3)
    # center-of-pixel: output (y,x) reads source (2y+1, 2x+1)
    assert (down == a[1::2, 1::2]).all()
    up = IM.resize_nn(a, 32, 16)
    assert up.shape == (16, 32, 3)
    assert (up[::2, ::2] == a).all() and (up[1::2, 1::2] == a).all()


def test_resize_images_pipeline(spark):
    """distributed resize: every output is out_w x out_h raw whose
    pixels equal the kernel applied to the reference image; captions
    and phash recompute ride through."""
    imgs = IM.synth_images(spark, 60)
    out = IM.resize_images(imgs, 16, 16).collect()
    assert len(out) == 60
    for r in out:
        assert (r["w"], r["h"], r["fmt"]) == (16, 16, "raw")
        arr = IM.raw_decode(r["bytes"], 16, 16)
        idx = int(r["image_id"][3:])
        src_w = (8, 16, 32)[idx % 3]
        src_h = (8, 16, 32)[(idx // 3) % 3]
        ref = IM._pixels_for(idx, src_w, src_h)
        if idx % 3 == 2:  # qzl source is lossy -> compare to quantized
            ref = IM.qzl_decode(IM.qzl_encode(ref), src_w, src_h)
        assert (arr == IM.resize_nn(ref, 16, 16)).all()
        assert r["phash"] == IM.phash64(arr)
        assert r["caption"].startswith(f"caption {idx} ")


def test_image_tile_stats_approx_tracks_exact(spark):
    """regression gate for the rows-only approx query (VERDICT r3
    item 6): image_tile_stats is the approx_count_distinct SCALE twin
    of the hash-oracled image_tile_stats_exact — per-tile counts must
    be identical and the HLL phash estimate must stay within the
    configured rsd band of the exact distinct count."""
    import __spark_entry__ as E

    approx = {r["tile_token"]: (r["n_images"], r["phash_approx_distinct"])
              for r in E.queries()["image_tile_stats"](
                  spark, "/root/testdata/sf0.001").collect()}
    exact = {r["tile_token"]: (r["n_images"], r["phash_distinct"])
             for r in E.queries()["image_tile_stats_exact"](
                 spark, "/root/testdata/sf0.001").collect()}
    assert set(approx) == set(exact)
    for tok, (n_ex, d_ex) in exact.items():
        n_ap, d_ap = approx[tok]
        assert n_ap == n_ex
        # default rsd 0.05; allow 3 sigma plus integer slack
        assert abs(d_ap - d_ex) <= max(2, int(0.15 * d_ex)), (
            tok, d_ap, d_ex)
