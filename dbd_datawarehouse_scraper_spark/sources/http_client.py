"""Production ``Fetcher`` adapters for the live DBD site.

The engine's fetch UDFs (http_fetch.py) drive any client implementing
the ``Fetcher`` protocol. Tests and the hermetic driver entrypoint use
``FakeDbdFetcher``; this module supplies the two production-shaped
clients a user of the reference scraper would deploy:

- ``HttpFetcher`` — plain HTTP (stdlib urllib, zero dependencies) with
  an INJECTABLE transport, so tests exercise the full parse path
  against canned HTML without a network. Mirrors the reference's URL
  scheme, redirect detection, labeled-field extraction, pagination
  math, and table-walk algorithm (scraper_v2.py:887-994, 1136-1231,
  1259-1331).
- ``SeleniumFetcher`` — the reference's real client shape (JS-rendered
  pages, cookie banner, input-box pagination, anti-detection flags,
  scraper_v2.py:412-455, 585-609, 944-958). Gated behind an import-try:
  constructing it without selenium installed raises a clear error, and
  nothing else in the engine depends on it.

Neither client is exercised against the live site in this repo (the
sandbox is hermetic); protocol conformance is pinned by
tests/test_http_client.py against a mocked transport.
"""

from __future__ import annotations

import os
import re
import time
import urllib.parse
import urllib.request
from collections.abc import Callable
from html.parser import HTMLParser
from typing import Any

BASE_URL = "https://datawarehouse.dbd.go.th"  # scraper_v2.py:121

# Labeled-field extraction on a profile page (scraper_v2.py:901-908):
#   "เลขทะเบียนนิติบุคคล : 0107537001650" / "ชื่อนิติบุคคล : บริษัท ABC จำกัด"
_REG_LABEL_RE = re.compile(r"เลขทะเบียนนิติบุคคล\s*[:\s]\s*(0\d{12})")
_NAME_LABEL_RE = re.compile(r"ชื่อนิติบุคคล\s*[:\s]\s*(.+?)(?:\n|$)")

NO_RESULTS_MARKER = "ไม่พบข้อมูล"  # scraper_v2.py:924
PROFILE_MARKERS = ("ชื่อนิติบุคคล", "ข้อมูลนิติบุคคล")  # scraper_v2.py:1269

INCOME_TABLE = "งบกำไรขาดทุน"
BALANCE_TABLE = "งบแสดงฐานะการเงิน"


def parse_total_pages(page_text: str) -> int:
    """Total page count from the pagination widget (scraper_v2.py:929-940):
    first line matching ``หน้า N / M`` wins, else the first ``/ M`` with
    M > 1."""
    for line in page_text.split("\n"):
        m = re.search(r"หน้า\s*\d+\s*/?\s*(\d+)", line)
        if m:
            return int(m.group(1))
        m = re.search(r"/\s*(\d+)", line)
        if m and int(m.group(1)) > 1:
            return int(m.group(1))
    return 1


class _TableTextParser(HTMLParser):
    """Minimal HTML → (page text, tables as cell grids). Tables nest no
    deeper than the DBD profile page needs (no table-in-table)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.tables: list[list[list[str]]] = []
        self._in_table = False
        self._in_cell = False
        self._row: list[str] | None = None
        self._cell: list[str] = []
        self._text: list[str] = []

    def _flush_cell(self) -> None:
        if self._in_cell:
            self._in_cell = False
            if self._row is not None:
                self._row.append("".join(self._cell).strip())

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag == "table":
            self._flush_cell()
            self._in_table = True
            self.tables.append([])
        elif tag == "tr" and self._in_table:
            # implicit close: real-world markup omits </td></tr>
            self._flush_cell()
            self._row = []
            self.tables[-1].append(self._row)
        elif tag in ("td", "th") and self._row is not None:
            self._flush_cell()
            self._in_cell = True
            self._cell = []
        elif tag in ("br", "p", "div", "tr", "li"):
            self._text.append("\n")

    def handle_endtag(self, tag: str) -> None:
        if tag == "table":
            self._flush_cell()
            self._in_table = False
            self._row = None
        elif tag in ("td", "th"):
            self._flush_cell()
        elif tag == "tr":
            self._flush_cell()
            self._row = None
            self._text.append("\n")
        elif tag in ("p", "div", "li"):
            self._text.append("\n")

    def handle_data(self, data: str) -> None:
        if self._in_cell:
            self._cell.append(data)
        self._text.append(data)

    @property
    def page_text(self) -> str:
        # collapse runs of blank lines the way body.text reads
        lines = [ln.strip() for ln in "".join(self._text).split("\n")]
        return "\n".join(ln for ln in lines if ln)


def _parse_html(html: str) -> _TableTextParser:
    p = _TableTextParser()
    p.feed(html)
    return p


def extract_financial_tables(
    tables: list[list[list[str]]],
    income_fields: tuple[str, ...],
    balance_fields: tuple[str, ...],
) -> dict[str, list[tuple[str, dict[int, str]]]]:
    """The reference's table-walk (scraper_v2.py:1136-1231) over parsed
    cell grids instead of WebDriver elements:

    - a financial table is one whose FIRST row mentions a 256x year;
    - years = first-row cells matching ``^25[6-7][0-9]$``;
    - a field's row is the first row containing the field text;
    - the value for year index i sits at data-cell index i*2 (each year
      has a value column and a %-change column);
    - ``-`` / empty / ``0.00`` cells are placeholders and are skipped.

    Tables are classified income vs balance by which configured field
    set their rows mention (the reference instead clicks tab buttons —
    a JS affordance an HTTP client doesn't have).
    """
    out: dict[str, list[tuple[str, dict[int, str]]]] = {}
    for grid in tables:
        if not grid or not any(re.search(r"256[0-9]", c) for c in grid[0]):
            continue
        years = [int(c) for c in grid[0] if re.match(r"^25[6-7][0-9]$", c.strip())]
        if not years:
            continue
        body_text = "\n".join(" ".join(r) for r in grid)
        for table_type, fields in (
            (INCOME_TABLE, income_fields),
            (BALANCE_TABLE, balance_fields),
        ):
            if not any(f in body_text for f in fields):
                continue
            rows: list[tuple[str, dict[int, str]]] = []
            claimed: set[str] = set()
            for row in grid[1:]:
                row_text = " ".join(row)
                field = next(
                    (f for f in fields if f in row_text and f not in claimed), None
                )
                if field is None:
                    continue
                claimed.add(field)
                # data cells = everything after the label cell
                cells = row[1:]
                by_year: dict[int, str] = {}
                for yi, year in enumerate(years):
                    ci = yi * 2
                    if ci < len(cells) and cells[ci].strip() not in ("-", "", "0.00"):
                        by_year[year] = cells[ci].strip()
                if by_year:
                    rows.append((field, by_year))
            if rows:
                out[table_type] = out.get(table_type, []) + rows
            break  # a year table belongs to exactly one statement
    return out


def _default_transport(url: str, timeout: float) -> tuple[str, str]:
    """GET ``url`` → (final_url, body). Final URL is how redirect-to-
    profile is detected (scraper_v2.py:895)."""
    req = urllib.request.Request(
        url,
        headers={
            # the reference pins a desktop UA for anti-detection
            # (scraper_v2.py:436-441); plain HTTP needs it too
            "User-Agent": (
                "Mozilla/5.0 (Windows NT 10.0; Win64; x64) "
                "AppleWebKit/537.36 (KHTML, like Gecko) "
                "Chrome/120.0.0.0 Safari/537.36"
            )
        },
    )
    with urllib.request.urlopen(req, timeout=timeout) as resp:  # noqa: S310
        charset = resp.headers.get_content_charset() or "utf-8"
        return resp.geturl(), resp.read().decode(charset, errors="replace")


class HttpFetcher:
    """``Fetcher`` over plain HTTP with the reference's URL scheme.

    ``transport(url) -> (final_url, html)`` is injectable; the default
    is a stdlib urllib GET. Pagination uses a ``page`` query parameter —
    the live site paginates via a JS input box (scraper_v2.py:944-958),
    which plain HTTP cannot drive; use ``SeleniumFetcher`` when the
    server does not honor the parameter. Per-request politeness delay
    matches the reference's PAGE_LOAD_WAIT sleep (scraper_v2.py:890).
    """

    def __init__(
        self,
        base_url: str = BASE_URL,
        income_fields: tuple[str, ...] = ("รายได้รวม", "กำไรสุทธิ"),
        balance_fields: tuple[str, ...] = ("สินทรัพย์รวม", "หนี้สินรวม"),
        transport: Callable[[str], tuple[str, str]] | None = None,
        timeout: float = 30.0,
        delay: float = 0.0,
    ):
        self.base_url = base_url.rstrip("/")
        self.income_fields = income_fields
        self.balance_fields = balance_fields
        self._transport = transport or (
            lambda url: _default_transport(url, timeout)
        )
        self.delay = delay

    def _get(self, url: str) -> tuple[str, str]:
        if self.delay:
            time.sleep(self.delay)
        return self._transport(url)

    # -- Fetcher protocol ---------------------------------------------------

    def search(self, term: str, page: int) -> dict[str, Any]:
        # scraper_v2.py:887-889
        url = f"{self.base_url}/juristic/searchInfo?keyword={urllib.parse.quote(term)}"
        if page > 1:
            url += f"&page={page}"
        final_url, html = self._get(url)
        parsed = _parse_html(html)
        text = parsed.page_text
        if "/company/profile/" in final_url:
            # unique hit → the site redirects to the profile page;
            # extract the labeled reg/name (scraper_v2.py:895-921)
            reg_m = _REG_LABEL_RE.search(text)
            if reg_m:
                name_m = _NAME_LABEL_RE.search(text)
                name = name_m.group(1).strip() if name_m else ""
                return {
                    "redirect": (reg_m.group(1), name),
                    "lines": [],
                    "total_pages": 1,
                }
            return {"redirect": None, "lines": [], "total_pages": 1}
        if NO_RESULTS_MARKER in text:
            return {"redirect": None, "lines": [], "total_pages": 1}
        return {
            "redirect": None,
            "lines": text.split("\n"),
            "total_pages": parse_total_pages(text),
        }

    def profile(self, prefixed_reg: str) -> dict[str, Any] | None:
        # scraper_v2.py:1259-1269: one prefixed URL per call; the fetch
        # UDF drives the ['5','7','6','3',''] fallback order
        url = f"{self.base_url}/company/profile/{prefixed_reg}"
        _, html = self._get(url)
        parsed = _parse_html(html)
        if not any(m in parsed.page_text for m in PROFILE_MARKERS):
            return None
        tables = extract_financial_tables(
            parsed.tables, self.income_fields, self.balance_fields
        )
        if not tables:
            return None
        return {"tables": tables}

    def close(self) -> None:  # stateless; protocol symmetry
        pass


class SeleniumFetcher:
    """The reference's WebDriver client behind the ``Fetcher`` protocol.

    Mirrors scraper_v2.py: anti-detection Chrome options (412-455),
    cookie-banner accept (585-609), redirect detection (893-921),
    input-box pagination (944-958), financial tab/button clicks and
    table walk (1136-1231, 1270-1320). Requires selenium — raises
    ImportError with guidance when absent; the engine never imports
    this module's selenium bits unless a SeleniumFetcher is built.
    """

    def __init__(
        self,
        base_url: str = BASE_URL,
        income_fields: tuple[str, ...] = ("รายได้รวม", "กำไรสุทธิ"),
        balance_fields: tuple[str, ...] = ("สินทรัพย์รวม", "หนี้สินรวม"),
        page_load_wait: float = 3.0,
        headless: bool = True,
        debug_dir: str | None = None,
    ):
        try:
            from selenium import webdriver
            from selenium.webdriver.chrome.options import Options
        except ImportError as exc:  # pragma: no cover - env without selenium
            raise ImportError(
                "SeleniumFetcher needs the 'selenium' package; use "
                "HttpFetcher or FakeDbdFetcher instead"
            ) from exc
        self.base_url = base_url.rstrip("/")
        self.income_fields = income_fields
        self.balance_fields = balance_fields
        self.page_load_wait = page_load_wait
        # --debug parity (scraper_v2.py:1508-1510): when set, every
        # profile fetch saves a post-extraction screenshot here
        self.debug_dir = debug_dir
        self._debug_seq = 0
        opts = Options()
        if headless:
            opts.add_argument("--headless=new")
        # anti-detection set from scraper_v2.py:418-443
        for flag in (
            "--no-sandbox",
            "--disable-dev-shm-usage",
            "--disable-blink-features=AutomationControlled",
            "--window-size=1920,1080",
        ):
            opts.add_argument(flag)
        opts.add_experimental_option("excludeSwitches", ["enable-automation"])
        opts.add_experimental_option("useAutomationExtension", False)
        self.driver = webdriver.Chrome(options=opts)
        self.driver.execute_script(
            "Object.defineProperty(navigator, 'webdriver', {get: () => undefined})"
        )

    def _body_text(self) -> str:
        from selenium.webdriver.common.by import By

        return self.driver.find_element(By.TAG_NAME, "body").text

    def _accept_cookies(self) -> None:
        # scraper_v2.py:585-609: click the banner button if present
        from selenium.webdriver.common.by import By

        try:
            for btn in self.driver.find_elements(By.TAG_NAME, "button"):
                if "ยอมรับ" in (btn.text or ""):
                    btn.click()
                    time.sleep(0.5)
                    return
        except Exception:  # noqa: BLE001 - banner absence is normal
            pass

    def search(self, term: str, page: int) -> dict[str, Any]:
        from selenium.webdriver.common.by import By

        if page == 1:
            self.driver.get(
                f"{self.base_url}/juristic/searchInfo?keyword="
                + urllib.parse.quote(term)
            )
            time.sleep(self.page_load_wait)
            self._accept_cookies()
        else:
            # scraper_v2.py:944-958: type the page number into the
            # pagination input (assumes page-1 search already loaded)
            inputs = self.driver.find_elements(
                By.CSS_SELECTOR, 'input[type="number"]'
            )
            if not inputs:
                return {"redirect": None, "lines": [], "total_pages": 1}
            inputs[0].clear()
            inputs[0].send_keys(str(page))
            inputs[0].send_keys("\n")
            time.sleep(self.page_load_wait)
        if "/company/profile/" in self.driver.current_url:
            text = self._body_text()
            reg_m = _REG_LABEL_RE.search(text)
            if reg_m:
                name_m = _NAME_LABEL_RE.search(text)
                return {
                    "redirect": (
                        reg_m.group(1),
                        name_m.group(1).strip() if name_m else "",
                    ),
                    "lines": [],
                    "total_pages": 1,
                }
            return {"redirect": None, "lines": [], "total_pages": 1}
        text = self._body_text()
        if NO_RESULTS_MARKER in text:
            return {"redirect": None, "lines": [], "total_pages": 1}
        return {
            "redirect": None,
            "lines": text.split("\n"),
            "total_pages": parse_total_pages(text),
        }

    def profile(self, prefixed_reg: str) -> dict[str, Any] | None:
        from selenium.webdriver.common.by import By

        self.driver.get(f"{self.base_url}/company/profile/{prefixed_reg}")
        time.sleep(self.page_load_wait)
        self._accept_cookies()
        text = self._body_text()
        if not any(m in text for m in PROFILE_MARKERS):
            self._debug_screenshot(prefixed_reg)
            return None
        # financial tab then statement buttons (scraper_v2.py:1273-1320)
        for label in ("ข้อมูลงบการเงิน", INCOME_TABLE):
            for el in self.driver.find_elements(By.XPATH, f"//*[contains(text(), '{label}')]"):
                try:
                    el.click()
                    time.sleep(1.0)
                    break
                except Exception:  # noqa: BLE001
                    continue
        grids = [
            [
                [c.text.strip() for c in r.find_elements(By.XPATH, "./th|./td")]
                for r in tbl.find_elements(By.TAG_NAME, "tr")
            ]
            for tbl in self.driver.find_elements(By.TAG_NAME, "table")
        ]
        tables = extract_financial_tables(
            grids, self.income_fields, self.balance_fields
        )
        self._debug_screenshot(prefixed_reg)
        return {"tables": tables} if tables else None

    def _debug_screenshot(self, prefixed_reg: str) -> None:
        """--debug hook: save a post-extraction screenshot per profile
        fetch (scraper_v2.py:1508-1510 saves one per company when debug
        is on). Screenshot failures never fail the fetch — the capture
        is a diagnostic side channel."""
        if not self.debug_dir:
            return
        self._debug_seq += 1
        name = f"debug_{self._debug_seq:04d}_{prefixed_reg.replace('/', '_')}.png"
        try:
            self.driver.save_screenshot(os.path.join(self.debug_dir, name))
        except Exception:  # noqa: BLE001 - diagnostics must not mask fetches
            pass

    def close(self) -> None:
        try:
            self.driver.quit()
        except Exception:  # noqa: BLE001
            pass
