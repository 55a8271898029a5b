"""$magic container-magic + header-dims checks (checks/image.py pure
Catalyst hex ops): container sniffing, PNG/FLSY dims parsing, the
row-check projection integration, and compile-time rule validation."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from invalid_spark import codecs, synth
from invalid_spark.checks import image, rows
from invalid_spark.dsl import load_rules
from invalid_spark.model import ErrorType


def _containers_df(spark):
    png = codecs.encode_png(np.zeros((3, 5, 3), dtype=np.uint8))
    flsy = codecs.FAKE_LOSSY_MAGIC + png
    rows_ = [
        ("png", bytearray(png)),
        ("flsy", bytearray(flsy)),
        ("jpeg", bytearray(b"\xff\xd8\xff\xe0" + b"\x00" * 20)),
        ("gif", bytearray(b"GIF89a" + b"\x07\x00\x05\x00" + b"\x00" * 10)),
        ("webp", bytearray(b"RIFF\x00\x00\x00\x00WEBP" + b"\x00" * 10)),
        ("bmp", bytearray(b"BM" + b"\x00" * 20)),
        (None, bytearray(b"JUNKJUNKJUNKJUNKJUNKJUNK")),
    ]
    return spark.createDataFrame(
        [(i, exp, bts) for i, (exp, bts) in enumerate(rows_)],
        "id long, expected string, bytes binary",
    )


def test_detected_container(spark):
    df = _containers_df(spark)
    got = df.select(
        "expected", image.detected_container("bytes").alias("det")
    ).collect()
    for r in got:
        assert r["det"] == r["expected"], r


def test_header_dims_png_and_flsy(spark):
    # encode_png takes (h, w, 3): 3 rows x 5 cols -> w=5, h=3
    df = _containers_df(spark)
    w, h = image.header_dims("bytes")
    got = {
        r["expected"]: (r["w"], r["h"])
        for r in df.select("expected", w.alias("w"), h.alias("h")).collect()
    }
    assert got["png"] == (5, 3)
    assert got["flsy"] == (5, 3)
    # no cheap dims for real jpeg/gif/webp/bmp or junk
    for k in ("jpeg", "gif", "webp", "bmp", None):
        assert got[k] == (None, None)


def test_magic_rule_planted_counts(spark):
    df = synth.images_df(spark, 200, partitions=4).withColumn(
        "idx",
        F.conv(F.substring("image_id", 5, 12), 10, 10).cast("long"),
    )
    df = df.withColumn(
        "fmt",
        F.when(F.col("idx") % 31 == 30, F.lit("gif")).otherwise(F.col("fmt")),
    ).withColumn(
        "w",
        F.when(F.col("idx") % 29 == 28, F.col("w") + 1).otherwise(F.col("w")),
    )
    rules = load_rules(
        """
image_id: {$type: $str}
bytes: {$type: $bin, $magic: {fmt: fmt, w: w, h: h}}
"""
    )
    v = rows.run_row_checks(df, rules, "image_id")
    by = {
        r["error_type"]: r["cnt"]
        for r in v.groupBy("error_type").agg(F.count("*").alias("cnt")).collect()
    }
    # expectations derived from the data itself (dup-id plants repeat
    # idx values, so Python range math would undercount); synth's own
    # enum_fmt plant (fmt="bmp" on a PNG-family payload) is a genuine
    # magic mismatch too
    n_magic = df.filter(
        (F.col("idx") % 31 == 30) | (F.col("idx") % 107 == 106)
    ).count()
    n_dims = df.filter(
        (F.col("idx") % 29 == 28) & ~(F.col("idx") % 31 == 30)
    ).count()
    assert by[ErrorType.MAGIC_MISMATCH] == n_magic
    # dims check is independent of the declared fmt: gif-declared rows
    # still parse their PNG-family header; synth's range_w plant
    # (declared w = 0 / 100001) is a genuine header mismatch too
    n_dims_all = df.filter(
        (F.col("idx") % 29 == 28) | (F.col("idx") % 103 == 102)
    ).count()
    assert by[ErrorType.HEADER_MISMATCH] == n_dims_all
    assert n_dims <= n_dims_all


def test_standalone_matches_rule_path(spark):
    df = synth.images_df(spark, 150, partitions=4).withColumn(
        "fmt", F.lit("gif")
    )
    rules = load_rules(
        """
image_id: {$type: $str}
bytes: {$type: $bin, $magic: {fmt: fmt, w: w, h: h}}
"""
    )
    a = (
        rows.run_row_checks(df, rules, "image_id")
        .groupBy("error_type").count().collect()
    )
    b = image.header_violations(df).groupBy("error_type").count().collect()
    assert {(r[0], r[1]) for r in a} == {(r[0], r[1]) for r in b}


def test_magic_compile_errors(spark):
    df = synth.images_df(spark, 4)
    with pytest.raises(ValueError, match="requires a binary column"):
        rows.compile_row_checks(
            df, load_rules("fmt: {$type: $str, $magic: {fmt: fmt}}")
        )
    with pytest.raises(ValueError, match="needs fmt"):
        rows.compile_row_checks(
            df, load_rules("bytes: {$type: $bin, $magic: {w: w, h: h}}")
        )
    with pytest.raises(ValueError, match="BOTH w and h"):
        rows.compile_row_checks(
            df, load_rules("bytes: {$type: $bin, $magic: {fmt: fmt, w: w}}")
        )
    with pytest.raises(ValueError, match=r"\[nope\] absent"):
        rows.compile_row_checks(
            df, load_rules("bytes: {$type: $bin, $magic: {fmt: nope}}")
        )


def test_truncated_bytes_keep_magic_but_still_flag_unknown(spark):
    # a payload cut before the full IHDR: magic passes (prefix intact),
    # dims return NULL (no false dims violation on short reads)
    png = codecs.encode_png(np.zeros((4, 4, 3), dtype=np.uint8))
    df = spark.createDataFrame(
        [(1, bytearray(png[:12]), "png", 4, 4)],
        "id long, bytes binary, fmt string, w int, h int",
    )
    assert image.header_violations(df, row_key="id").count() == 0
