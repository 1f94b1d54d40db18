"""HTML fixed-package extraction (functions/html.py, SURVEY F7)."""

from vunnel_spark.functions.html import extract_alas_packages


def test_alas_state_machine(spark):
    html = (
        '<html><body>'
        '<div id="issue_overview"><p>Issue Overview:</p><p>A bad bug.</p></div>'
        '<div id="new_packages">'
        "<span>x86_64:</span><span>alpha-1.0-1.amzn2</span>"
        "<span>i686:</span><span>ignored-9.9-9.amzn2</span>"
        "<span>src:</span><span>alpha-1.0-1.amzn2.src</span>"
        "<span>noarch:</span><span>beta-2.0-1.amzn2</span>"
        "</div>"
        "<span>outside-3.0-1.amzn2</span>"
        "</body></html>"
    )
    df = spark.createDataFrame([(1, html), (2, "<html><body>empty</body></html>")],
                               ["page_id", "html"])
    rows = {(r.page_id, r.arch, r.pkg) for r in extract_alas_packages(df).collect()}
    # i686 section skipped (not a relevant arch), data outside the
    # new_packages element never collected, empty page yields nothing
    assert rows == {
        (1, "x86_64", "alpha-1.0-1.amzn2"),
        (1, "src", "alpha-1.0-1.amzn2.src"),
        (1, "noarch", "beta-2.0-1.amzn2"),
    }
    overviews = {r.overview for r in extract_alas_packages(df).collect()}
    assert overviews == {"A bad bug."}


def test_alas_name_version_reference_examples(spark):
    """split_rpm_filename's documented examples (utils/rpm.py:22-23)
    through get_package_name_version (amazon/parser.py:149-161): arch
    stripped, release joined, epoch dropped, '.rpm' appended when the
    scraped string lacks it."""
    from pyspark.sql import functions as F

    from vunnel_spark.functions.html import alas_name_version

    df = spark.createDataFrame(
        [("foo-1.0-1.x86_64.rpm",), ("1:bar-9-123a.ia64.rpm",),
         ("kernel-4.14.304-226.531.amzn2.x86_64",)],
        "pkg string",
    )
    nv = alas_name_version(F.col("pkg"))
    got = {
        r.pkg: (r.name, r.version)
        for r in df.select(
            "pkg", nv["name"].alias("name"), nv["version"].alias("version")
        ).collect()
    }
    assert got["foo-1.0-1.x86_64.rpm"] == ("foo", "1.0-1")
    assert got["1:bar-9-123a.ia64.rpm"] == ("bar", "9-123a")
    assert got["kernel-4.14.304-226.531.amzn2.x86_64"] == (
        "kernel", "4.14.304-226.531.amzn2"
    )
