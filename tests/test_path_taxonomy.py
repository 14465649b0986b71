"""F4/F5 path-taxonomy skips: truth table ported from the reference's
is_cloud_or_remote_path + unix system-skip logic
(src/modules/filesystem_scan.rs:71-112, :129-162, :630-654), evaluated
through the Catalyst higher-order-function rendering."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from loki_rs_spark.operators.filters import (
    apply_path_taxonomy_filters,
    cloud_path_predicate,
    system_path_predicate,
)


def _eval(spark, pred_builder, paths):
    df = spark.createDataFrame([(p,) for p in paths], "p string")
    rows = df.select("p", pred_builder(F.col("p")).alias("x")).collect()
    return {r["p"]: bool(r["x"]) for r in rows}


CLOUD_CASES = [
    ("/home/u/OneDrive/doc.txt", True),  # direct segment, case-folded
    ("/home/u/Dropbox/x", True),
    ("/home/u/.dropbox/cache", True),
    ("/home/u/Google Drive/x", True),
    ("/home/u/mydropbox/x", False),  # segment-exact, no substring match
    ("/home/u/OneDrive - Contoso/x", True),  # dynamic 'onedrive - ' prefix
    ("/home/u/OneDrive-Tenant/x", True),
    ("/home/u/Nextcloud-acct/x", True),
    ("/Users/u/Library/CloudStorage/Drive/x", True),  # adjacent pair
    ("/Users/u/Library/Other/CloudStorage", False),  # pair must be adjacent
    ("C:\\Users\\u\\OneDrive\\f.txt", True),  # backslash normalization
    ("/home/u/projects/code.py", False),
]


@pytest.mark.parametrize("path,hit", CLOUD_CASES)
def test_cloud_path_truth_table(spark, path, hit):
    got = _eval(spark, cloud_path_predicate, [path])
    assert got[path] == hit, path


SYSTEM_CASES = [
    ("/proc/123/maps", True),
    ("/sys/kernel/debug/x", True),
    ("/dev/null", True),
    ("/run/lock", True),
    ("/usr/src/linux/x", True),
    ("/etc/init/initctl", True),  # ends-with rule
    ("/media/usb0/file", True),  # mounted device, default config
    ("/volumes/ext/file", True),
    ("/home/user/file", False),
    ("/usr/bin/tool", False),
]


@pytest.mark.parametrize("path,hit", SYSTEM_CASES)
def test_system_path_truth_table(spark, path, hit):
    got = _eval(spark, system_path_predicate, [path])
    assert got[path] == hit, path


def test_scan_all_drives_keeps_mounted(spark):
    paths = ["/media/usb0/file", "/proc/x"]
    got = _eval(
        spark,
        lambda c: system_path_predicate(c, scan_all_drives=True),
        paths,
    )
    assert got["/media/usb0/file"] is False  # mounted devices kept
    assert got["/proc/x"] is True  # system skip still applies


def test_apply_path_taxonomy_filters(spark):
    rows = [
        ("keep", "/home/u/code.py"),
        ("cloud", "/home/u/OneDrive/x"),
        ("system", "/proc/self/maps"),
    ]
    df = spark.createDataFrame(rows, "k string, tool string")
    kept = [r["k"] for r in apply_path_taxonomy_filters(df).collect()]
    assert kept == ["keep"]


def test_trailing_library_segment_is_false_not_null(spark):
    # round-3 ADVICE: zip_with null-padding made a trailing 'library'
    # segment evaluate to NULL, silently dropping the row downstream.
    paths = ["/home/u/library", "/home/u/Library/", "library"]
    got = _eval(spark, cloud_path_predicate, paths)
    assert got == {p: False for p in paths}


def test_system_prefix_is_case_sensitive(spark):
    # reference filesystem_scan.rs:632-654 matches raw path strings
    got = _eval(spark, system_path_predicate, ["/PROC/123", "/proc/123"])
    assert got["/PROC/123"] is False
    assert got["/proc/123"] is True


def test_null_path_rows_are_kept(spark):
    rows = [("keep", "/home/u/code.py"), ("nullp", None)]
    df = spark.createDataFrame(rows, "k string, tool string")
    kept = sorted(r["k"] for r in apply_path_taxonomy_filters(df).collect())
    assert kept == ["keep", "nullp"]


def test_scan_all_drives_keeps_cloud_paths(spark):
    # reference filesystem_scan.rs:622-628: cloud skip applies only when
    # NOT scan_all_drives
    rows = [("cloud", "/home/u/OneDrive/x"), ("system", "/proc/x")]
    df = spark.createDataFrame(rows, "k string, tool string")
    kept = [
        r["k"]
        for r in apply_path_taxonomy_filters(df, scan_all_drives=True).collect()
    ]
    assert kept == ["cloud"]
