"""Synthetic table determinism + planted-violation bookkeeping."""

from pyspark.sql import functions as F

from invalid_spark import codecs, synth


def test_rows_deterministic_across_partitionings(spark):
    a = synth.images_df(spark, 60, partitions=2).orderBy("image_id").collect()
    b = synth.images_df(spark, 60, partitions=5).orderBy("image_id").collect()
    assert [r.image_id for r in a] == [r.image_id for r in b]
    assert [bytes(r.bytes) for r in a] == [bytes(r.bytes) for r in b]
    assert [r.phash for r in a] == [r.phash for r in b]


def test_schema_matches_input_hint(spark):
    df = synth.images_df(spark, 5)
    assert [f.name for f in df.schema.fields] == [
        "image_id", "bytes", "w", "h", "fmt", "caption", "phash", "license_id",
    ]
    types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    assert types["bytes"] == "binary"
    assert types["w"] == "int" and types["h"] == "int"
    assert types["phash"] == "bigint"


def test_planted_violations_present(spark):
    n = 300
    rows = {r.image_id: r for r in synth.images_df(spark, n).collect()}
    # enum violations at fixed indices
    for i in synth.violation_indices(n, "enum_fmt"):
        rid = f"img-{i:012d}"
        key = rid if rid in rows else f"img-{i-1:012d}"  # may be dup-renamed
        assert any(
            r.fmt == "bmp" for r in rows.values() if r.caption.endswith(f"({i})")
        )
    # corrupt bytes really fail to decode
    for i in synth.violation_indices(n, "corrupt"):
        r = [x for x in rows.values() if x.caption.endswith(f"({i})")]
        if not r:  # caption may be blanked by len plant; skip those
            continue
        try:
            codecs.decode_image(bytes(r[0].bytes))
            raise AssertionError("corrupt row decoded")
        except codecs.DecodeError:
            pass
    # clean rows decode and match stored phash
    clean = [
        r
        for r in rows.values()
        if r.fmt in ("png", "jpeg", "webp") and len(r.caption) > 0
    ]
    ok = 0
    for r in clean[:20]:
        try:
            px = codecs.decode_image(bytes(r.bytes))
        except codecs.DecodeError:
            continue
        if codecs.phash64(px) == r.phash:
            ok += 1
    assert ok > 10  # most clean rows have recomputable phash


def test_hot_phash_skew(spark):
    df = synth.images_df(spark, 200, skew=True)
    hot = df.filter(df.phash == synth.HOT_PHASH).count()
    assert 15 <= hot <= 25  # ~10%
    # skew is opt-in: the default table has no hot key
    assert synth.images_df(spark, 200).filter(
        F.col("phash") == synth.HOT_PHASH
    ).count() == 0
