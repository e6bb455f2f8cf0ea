"""HttpFetcher protocol conformance against a canned-HTML transport.

No network: the transport is a dict-backed fake serving the HTML shapes
the reference scraper sees (search results with pagination, redirect
profiles, financial tables with value/%change column pairs)."""

import pytest
from pyspark.sql import functions as F

from dbd_datawarehouse_scraper_spark.sources.http_client import (
    BALANCE_TABLE,
    INCOME_TABLE,
    HttpFetcher,
    extract_financial_tables,
    parse_total_pages,
)

REG_A = "0105536001234"
REG_B = "0105536005678"


def _search_page(lines, page, total_pages):
    rows = "".join(f"<div>{ln}</div>" for ln in lines)
    return f"<html><body>{rows}<div>หน้า {page} / {total_pages}</div></body></html>"


def _profile_page(reg, name):
    return f"""<html><body>
    <div>ข้อมูลนิติบุคคล</div>
    <div>เลขทะเบียนนิติบุคคล : {reg}</div>
    <div>ชื่อนิติบุคคล : {name}</div>
    <table>
      <tr><th>รายการ</th><th>2566</th><th>%</th><th>2565</th><th>%</th></tr>
      <tr><td>รายได้รวม</td><td>1,234.50</td><td>5%</td><td>1,000.00</td><td>2%</td></tr>
      <tr><td>กำไรสุทธิ</td><td>-</td><td></td><td>99.25</td><td>1%</td></tr>
    </table>
    <table>
      <tr><th>รายการ</th><th>2566</th><th>%</th><th>2565</th><th>%</th></tr>
      <tr><td>สินทรัพย์รวม</td><td>8,888.00</td><td>3%</td><td>0.00</td><td></td></tr>
    </table>
    </body></html>"""


class FakeTransport:
    """url -> (final_url, html); unique-hit searches redirect."""

    def __init__(self):
        self.pages = {}
        self.calls = []

    def add(self, url, html, final_url=None):
        self.pages[url] = (final_url or url, html)

    def __call__(self, url):
        self.calls.append(url)
        if url not in self.pages:
            return url, "<html><body>ไม่พบข้อมูล</body></html>"
        return self.pages[url]


@pytest.fixture()
def site():
    t = FakeTransport()
    base = "https://datawarehouse.dbd.go.th"
    # multi-hit search, two pages
    t.add(
        f"{base}/juristic/searchInfo?keyword=%E0%B8%A3%E0%B8%A7%E0%B8%A1",
        _search_page(
            [f"1 {REG_A} บริษัท รวมมิตร จำกัด", f"2 {REG_B} บริษัท รวมพล จำกัด"],
            1,
            2,
        ),
    )
    t.add(
        f"{base}/juristic/searchInfo?keyword=%E0%B8%A3%E0%B8%A7%E0%B8%A1&page=2",
        _search_page([f"11 {REG_B} บริษัท รวมค้า จำกัด"], 2, 2),
    )
    # unique-hit search → redirect to profile
    t.add(
        f"{base}/juristic/searchInfo?keyword=%E0%B8%A3%E0%B8%A7%E0%B8%A1%E0%B8%A1%E0%B8%B4%E0%B8%95%E0%B8%A3",
        _profile_page(REG_A, "บริษัท รวมมิตร จำกัด"),
        final_url=f"{base}/company/profile/5{REG_A}",
    )
    # profile valid only under prefix '5'
    t.add(f"{base}/company/profile/5{REG_A}", _profile_page(REG_A, "บริษัท รวมมิตร จำกัด"))
    return t


def test_search_lines_and_pagination(site):
    f = HttpFetcher(transport=site)
    res = f.search("รวม", 1)
    assert res["redirect"] is None
    assert res["total_pages"] == 2
    assert any(REG_A in ln for ln in res["lines"])
    res2 = f.search("รวม", 2)
    assert any("รวมค้า" in ln for ln in res2["lines"])


def test_search_redirect_extracts_labeled_fields(site):
    f = HttpFetcher(transport=site)
    res = f.search("รวมมิตร", 1)
    assert res["redirect"] == (REG_A, "บริษัท รวมมิตร จำกัด")
    assert res["lines"] == []


def test_search_no_results(site):
    f = HttpFetcher(transport=site)
    res = f.search("ไม่มีทาง", 1)
    assert res["redirect"] is None and res["lines"] == [] and res["total_pages"] == 1


def test_profile_prefix_fallback_semantics(site):
    f = HttpFetcher(transport=site)
    assert f.profile(f"7{REG_A}") is None  # wrong prefix → no profile markers
    prof = f.profile(f"5{REG_A}")
    assert prof is not None
    income = dict(prof["tables"][INCOME_TABLE])
    # year→raw mapping, %-change columns skipped, '-' placeholder dropped
    assert income["รายได้รวม"] == {2566: "1,234.50", 2565: "1,000.00"}
    assert income["กำไรสุทธิ"] == {2565: "99.25"}
    balance = dict(prof["tables"][BALANCE_TABLE])
    assert balance["สินทรัพย์รวม"] == {2566: "8,888.00"}  # 0.00 skipped


def test_total_pages_patterns():
    assert parse_total_pages("foo\nหน้า 1 / 7\nbar") == 7
    assert parse_total_pages("results\n1 / 4") == 4
    assert parse_total_pages("no pagination") == 1


def test_extract_tables_value_column_stride():
    grid = [
        ["รายการ", "2566", "%", "2565", "%"],
        ["รายได้รวม", "10.00", "1%", "20.00", "2%"],
    ]
    out = extract_financial_tables([grid], ("รายได้รวม",), ())
    assert dict(out[INCOME_TABLE]) == {"รายได้รวม": {2566: "10.00", 2565: "20.00"}}


def test_pipeline_conformance_with_http_fetcher(spark, site):
    """The fetch UDFs drive HttpFetcher exactly like FakeDbdFetcher:
    search cascade finds the exact hit, profile extraction emits the
    long relation."""
    from dbd_datawarehouse_scraper_spark.sources.http_fetch import (
        fetch_financial_pages,
        fetch_search_results,
    )

    companies = spark.createDataFrame(
        [("บริษัท รวมมิตร จำกัด", ["รวมมิตร", "รวม"])],
        "company_name string, terms array<string>",
    )
    found = fetch_search_results(
        companies, lambda: HttpFetcher(transport=site), fetch_partitions=1
    )
    rows = found.collect()
    assert any(r["exact_hit"] and r["redirect_reg"] == REG_A for r in rows)

    matched = spark.createDataFrame(
        [("บริษัท รวมมิตร จำกัด", REG_A, "exact", "1")],
        "company_name string, registration_number string, "
        "match_type string, search_strategy string",
    )
    fin = fetch_financial_pages(
        matched, lambda: HttpFetcher(transport=site), fetch_partitions=1
    ).filter(F.col("fetch_error").isNull())
    got = {(r["table_type"], r["field_name"], r["year"], r["raw_value"])
           for r in fin.collect()}
    assert (INCOME_TABLE, "รายได้รวม", 2566, "1,234.50") in got
    assert (BALANCE_TABLE, "สินทรัพย์รวม", 2566, "8,888.00") in got
    # placeholder years never materialize
    assert not any(t[1] == "กำไรสุทธิ" and t[2] == 2566 for t in got)


def test_selenium_fetcher_import_gate():
    try:
        import selenium  # noqa: F401

        pytest.skip("selenium installed; gate not exercised")
    except ImportError:
        pass
    from dbd_datawarehouse_scraper_spark.sources.http_client import SeleniumFetcher

    with pytest.raises(ImportError, match="selenium"):
        SeleniumFetcher()


class TestParserRobustness:
    """The stdlib HTML parser must survive the malformed markup a live
    site can serve: unclosed tags, entities, rowspan-ish missing cells,
    nested markup inside cells, tables with no year header."""

    def _fetch(self, html):
        t = FakeTransport()
        url = f"https://datawarehouse.dbd.go.th/company/profile/5{REG_A}"
        t.add(url, html)
        return HttpFetcher(transport=t), url

    def test_unclosed_tags_and_entities(self):
        f, url = self._fetch(
            "<html><body><div>ข้อมูลนิติบุคคล<div>"
            "<table><tr><th>รายการ<th>2566<th>%"
            "<tr><td>รายได้รวม &amp; อื่นๆ<td>1,000.00<td>5%"
            "</table></body>"  # unclosed html, no </tr>/<td> closes
        )
        prof = f.profile("5" + REG_A)
        assert prof is not None
        income = dict(prof["tables"][INCOME_TABLE])
        assert income["รายได้รวม"] == {2566: "1,000.00"}

    def test_nested_markup_inside_cells(self):
        f, url = self._fetch(
            "<html><body>ข้อมูลนิติบุคคล"
            "<table><tr><th><span>รายการ</span></th><th><b>2566</b></th><th>%</th></tr>"
            "<tr><td><a href='#'>รายได้รวม</a></td><td><span>7.00</span></td><td></td></tr>"
            "</table></body></html>"
        )
        prof = f.profile("5" + REG_A)
        assert dict(prof["tables"][INCOME_TABLE])["รายได้รวม"] == {2566: "7.00"}

    def test_short_rows_do_not_crash(self):
        f, url = self._fetch(
            "<html><body>ข้อมูลนิติบุคคล"
            "<table><tr><th>รายการ</th><th>2566</th><th>%</th><th>2565</th><th>%</th></tr>"
            "<tr><td>รายได้รวม</td><td>1.00</td></tr>"  # 2565 cell missing
            "</table></body></html>"
        )
        prof = f.profile("5" + REG_A)
        assert dict(prof["tables"][INCOME_TABLE])["รายได้รวม"] == {2566: "1.00"}

    def test_no_year_table_means_no_profile(self):
        f, url = self._fetch(
            "<html><body>ข้อมูลนิติบุคคล"
            "<table><tr><th>อะไรสักอย่าง</th></tr><tr><td>รายได้รวม</td></tr></table>"
            "</body></html>"
        )
        assert f.profile("5" + REG_A) is None

    def test_garbage_page_is_no_results(self):
        import urllib.parse

        t = FakeTransport()
        url = (
            "https://datawarehouse.dbd.go.th/juristic/searchInfo?keyword="
            + urllib.parse.quote("อะไร")
        )
        t.add(url, "<<<not html at all>>> \x00\x01 <table><tr>")
        f = HttpFetcher(transport=t)
        res = f.search("อะไร", 1)
        assert res["redirect"] is None
        assert res["total_pages"] == 1
