"""Hot-band-key salting in the shared pigeonhole band self-join
(VERDICT r3 item 3): a synthetic hot band must trip the salt guard,
and the salted output must equal the unsalted / brute-force pairs."""

import itertools

from pyspark.sql import functions as F

from s2spark import text as T


def _bands_df(spark, sigs, n_bands=4, bits=16):
    """(id, sig, band, band_key) rows for 16-bit signatures."""
    band_bits = bits // n_bands
    mask = (1 << band_bits) - 1
    rows = []
    for i, s in enumerate(sigs):
        for b in range(n_bands):
            rows.append((i, s, b, (s >> (b * band_bits)) & mask))
    return spark.createDataFrame(
        rows, "id long, sig long, band int, band_key long")


def _brute(sigs, max_hamming):
    out = set()
    for (i, a), (j, b) in itertools.combinations(enumerate(sigs), 2):
        h = bin(a ^ b).count("1")
        if h <= max_hamming:
            out.add((i, j, h))
    return out


def test_hot_band_salted_output_identical(spark):
    # 40 near-identical signatures (identical band 0) -> one hot
    # band_key; plus a spread tail. max_hamming=3 over 16-bit sigs.
    sigs = [0x00F0 | (k << 8) for k in range(40)]        # band0 == 0x0
    sigs += [0x1111 * k % 0xFFFF for k in range(3, 23)]
    bands = _bands_df(spark, sigs)

    # the guard must actually fire at this salt_target
    hot = bands.groupBy("band", "band_key") \
        .agg(F.count("*").alias("n")).where(F.col("n") > 8).count()
    assert hot >= 1, "fixture should contain an oversized band key"

    salted = sorted(map(tuple, T.banded_hamming_pairs(
        bands, 3, salt_target=8, max_salt=4).collect()))
    unsalted = sorted(map(tuple, T.banded_hamming_pairs(
        bands, 3, salt_target=10**9).collect()))
    assert salted == unsalted == sorted(_brute(sigs, 3))


def test_simhash_pairs_through_salted_join(spark, sf_dir):
    """simhash_pairs now routes through banded_hamming_pairs; its
    output must still match the brute-force all-pairs filter."""
    sig = T.simhash(spark, sf_dir).limit(150).cache()
    rows = [(r.doc_id, r.simhash) for r in sig.collect()]
    expect = set()
    for (d1, s1), (d2, s2) in itertools.combinations(sorted(rows), 2):
        h = bin(s1 ^ s2).count("1")
        if h <= T.SIMHASH_HAMMING_MAX:
            expect.add((d1, d2, h))
    n_bands = T.SIMHASH_HAMMING_MAX + 1
    band_bits = T.SIMHASH_BITS // n_bands
    mask = (1 << band_bits) - 1
    parts = [sig.select(F.col("doc_id").alias("id"),
                        F.col("simhash").alias("sig"),
                        F.lit(i).alias("band"),
                        F.shiftright("simhash", i * band_bits)
                        .bitwiseAND(F.lit(mask)).alias("band_key"))
             for i in range(n_bands)]
    bands = parts[0]
    for p in parts[1:]:
        bands = bands.unionAll(p)
    got = set(map(tuple, T.banded_hamming_pairs(
        bands, T.SIMHASH_HAMMING_MAX, salt_target=4).collect()))
    assert got == expect
    sig.unpersist()
