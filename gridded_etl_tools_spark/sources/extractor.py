"""Extractors: retrying fetch fan-out (SURVEY §2.1 S1-S9).

Reference parity (``gridded_etl_tools/utils/extractor.py``):

* ``Extractor.pool``              (50-99)   — parallel fan-out with
  any-success / all-success semantics.
* ``retry_with_backoff``          (292-346) — retry loop, ignorable vs
  fatal exception classes.
* exponential backoff             (240-260) — ``factor * 2**(attempt-1)``.
* linear backoff (S3 flavor)      (568-574) — ``attempt * factor``.
* ``HTTPExtractor.get_links``     (422-475) — scrape + filter + absolutize
  links from an HTML index page.
* ``HTTPExtractor.request``       (477-560) — download one URL.
* ``FTPExtractor``                (749-939) — listed/regex-find/fetch.

Spark mapping: catalog discovery is driver-side (tiny); the *fetch* step
fans out as executor tasks over a DataFrame of work items
(:func:`fetch_distributed`), replacing the reference's ThreadPool.  The
retry/backoff logic lives in plain Python so the same code runs in a
driver loop or inside an executor task.

Network-dependent pieces (urllib, ftplib) are import-gated and injectable
so tests run hermetically — this container has no network.
"""

from __future__ import annotations

import re
import time
from collections.abc import Callable, Iterable, Sequence
from dataclasses import dataclass, field
from html.parser import HTMLParser
from typing import Any
from urllib.parse import urljoin

from pyspark.sql import DataFrame, SparkSession


class ExtractionError(RuntimeError):
    pass


def exponential_backoff(attempt: int, factor: float = 1.0) -> float:
    """Delay before retry ``attempt`` (1-based): ``factor * 2**(attempt-1)``."""
    return factor * (2 ** (attempt - 1))


def linear_backoff(attempt: int, factor: float = 30.0) -> float:
    """S3-flavored linear delay: ``attempt * factor``."""
    return attempt * factor


def retry_with_backoff(
    fn: Callable[[], Any],
    retries: int = 5,
    backoff: Callable[[int], float] = exponential_backoff,
    ignorable_exceptions: tuple[type[BaseException], ...] = (Exception,),
    fatal_exceptions: tuple[type[BaseException], ...] = (),
    sleep: Callable[[float], None] = time.sleep,
) -> Any:
    """Run ``fn`` with up to ``retries`` retries.  Fatal exceptions
    propagate immediately; ignorable ones trigger backoff + retry; the
    final failure re-raises wrapped in ExtractionError."""
    last: BaseException | None = None
    for attempt in range(1, retries + 2):
        try:
            return fn()
        except fatal_exceptions:
            raise
        except ignorable_exceptions as e:  # noqa: PERF203
            last = e
            if attempt <= retries:
                sleep(backoff(attempt))
    raise ExtractionError(f"failed after {retries} retries") from last


def pool(
    jobs: Sequence[Callable[[], bool]],
    accept_any_success: bool = False,
    max_workers: int = 8,
) -> bool:
    """Driver-side fan-out with the reference's success semantics:
    all-success (default) or any-success.  For data-plane-scale fetch
    lists use :func:`fetch_distributed` instead."""
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=max_workers) as ex:
        results = list(ex.map(lambda j: bool(j()), jobs))
    if not results:
        return True
    return any(results) if accept_any_success else all(results)


def fetch_distributed(
    spark: SparkSession,
    work_items: list[dict[str, str]],
    fetch_one: Callable[[dict[str, str]], dict[str, Any]],
    num_partitions: int | None = None,
) -> DataFrame:
    """Executor-parallel fetch: the Spark replacement for the reference's
    ThreadPool boundary.  ``fetch_one`` must be picklable and is invoked
    once per work item inside tasks; returns a DataFrame of its result
    dicts (must include a boolean 'success').

    This is one of the very few places the engine runs Python per row —
    justified because the work is network I/O, not compute."""
    n = num_partitions or min(len(work_items), 64) or 1
    rdd = spark.sparkContext.parallelize(work_items, n).map(fetch_one)
    return spark.createDataFrame(rdd)


# --- HTML link scraping (HTTPExtractor.get_links) ---------------------------

class _HrefParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__()
        self.hrefs: list[str] = []

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag.lower() == "a":
            for k, v in attrs:
                if k.lower() == "href" and v:
                    self.hrefs.append(v)


def parse_links(
    html: str,
    base_url: str,
    filter_func: Callable[[str], bool] | None = None,
) -> set[str]:
    """Extract, filter, and absolutize ``<a href>`` targets from an HTML
    index page (pure function over fetched bytes; stdlib HTMLParser
    instead of BeautifulSoup — no extra dependency)."""
    p = _HrefParser()
    p.feed(html)
    out = set()
    for href in p.hrefs:
        absu = urljoin(base_url, href)
        if filter_func is None or filter_func(absu):
            out.add(absu)
    return out


def http_get(url: str, timeout: float = 10.0) -> bytes:
    """Minimal stdlib HTTP GET used by the extractors.  Import-gated:
    raises a clear error in offline environments."""
    from urllib.request import urlopen  # deferred: offline containers

    with urlopen(url, timeout=timeout) as resp:  # noqa: S310
        return resp.read()


@dataclass
class HTTPExtractor:
    """Catalog discovery + retrying download over HTTP (S5/S6).

    ``get`` is injectable for tests / offline use."""

    retries: int = 5
    backoff_factor: float = 1.0
    get: Callable[[str, float], bytes] = field(default=lambda u, t: http_get(u, t))
    timeout: float = 10.0

    def get_links(
        self, url: str, filter_func: Callable[[str], bool] | None = None
    ) -> set[str]:
        html = retry_with_backoff(
            lambda: self.get(url, self.timeout),
            retries=self.retries,
            backoff=lambda a: exponential_backoff(a, self.backoff_factor),
        ).decode("utf-8", errors="replace")
        return parse_links(html, url, filter_func)

    def request(self, remote: str, local_path: str) -> bool:
        def fetch() -> bool:
            data = self.get(remote, self.timeout)
            with open(local_path, "wb") as f:
                f.write(data)
            return True

        return bool(
            retry_with_backoff(
                fetch,
                retries=self.retries,
                backoff=lambda a: exponential_backoff(a, self.backoff_factor),
            )
        )

    def batch(
        self, pairs: Iterable[tuple[str, str]], accept_any_success: bool = False
    ) -> bool:
        jobs = [
            (lambda r=r, l=l: self.request(r, l)) for r, l in pairs  # noqa: E741
        ]
        return pool(jobs, accept_any_success=accept_any_success)


@dataclass
class FTPExtractor:
    """FTP find/fetch (S7).  The connection factory is injectable; the
    default uses stdlib ftplib (deferred import)."""

    host: str = ""
    cwd: str = ""
    retries: int = 5
    connect: Callable[[], Any] | None = None

    def _conn(self):
        if self.connect is not None:
            return self.connect()
        import ftplib  # deferred: offline containers

        c = ftplib.FTP(self.host, timeout=30)
        c.login()
        if self.cwd:
            c.cwd(self.cwd)
        return c

    def find(self, pattern: str) -> list[str]:
        """Regex-filtered listing of the working directory (reference
        ``find``, extractor.py:904-921)."""
        rx = re.compile(pattern)
        conn = self._conn()
        try:
            names = conn.nlst()
        finally:
            try:
                conn.quit()
            except Exception:  # noqa: BLE001
                pass
        return sorted(n for n in names if rx.search(n))

    def request(self, remote: str, local_path: str) -> bool:
        def fetch() -> bool:
            conn = self._conn()
            try:
                with open(local_path, "wb") as f:
                    conn.retrbinary(f"RETR {remote}", f.write)
            finally:
                try:
                    conn.quit()
                except Exception:  # noqa: BLE001
                    pass
            return True

        return bool(
            retry_with_backoff(
                fetch, retries=self.retries, backoff=linear_backoff
            )
        )
