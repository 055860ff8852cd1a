"""HTTP helper with the reference's retry discipline.

Reimplements the retry/backoff/429 semantics of
reference src/ingestion/nyc_open_data_fetcher.py:125-179 with stdlib
urllib (no extra deps): 3 attempts, exponential backoff 2^attempt seconds,
HTTP 429 honors Retry-After (default 60 s).

Used inside Data Source partition readers — each executor task applies the
same policy to its own page range, so a rate-limited partition backs off
without stalling sibling partitions.
"""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.request


class HttpError(RuntimeError):
    pass


def coercing_caster(dt):
    """Cell caster for API payloads: malformed numerics coerce to NULL (the
    engine's errors='coerce' policy, reference pd.to_numeric) instead of
    raising and killing the executor task. Integers route through float so
    '12.0' lands as 12, matching pandas."""
    from pyspark.sql.types import DoubleType, FloatType, IntegerType, LongType

    if isinstance(dt, (IntegerType, LongType)):
        def cast_int(v):
            if v in (None, ""):
                return None
            try:
                return int(float(v))
            except (ValueError, TypeError):
                return None

        return cast_int
    if isinstance(dt, (DoubleType, FloatType)):
        def cast_float(v):
            if v in (None, ""):
                return None
            try:
                return float(v)
            except (ValueError, TypeError):
                return None

        return cast_float
    return lambda v: None if v is None else str(v)


def request_json(
    url: str,
    body: dict | None = None,
    timeout: float = 30.0,
    max_retries: int = 3,
    retry_after_default: float = 60.0,
    sleep=time.sleep,
):
    """GET (or POST when body given) returning parsed JSON, with retries."""
    data = json.dumps(body).encode() if body is not None else None
    headers = {"Accept": "application/json"}
    if data is not None:
        headers["Content-Type"] = "application/json"

    last: Exception | None = None
    for attempt in range(max_retries):
        req = urllib.request.Request(url, data=data, headers=headers)
        try:
            with urllib.request.urlopen(req, timeout=timeout) as resp:
                return json.loads(resp.read().decode())
        except urllib.error.HTTPError as e:
            if e.code == 429:
                wait = float(e.headers.get("Retry-After", retry_after_default))
                sleep(wait)
                last = e
                continue
            last = e
        except (urllib.error.URLError, TimeoutError, OSError) as e:
            last = e
        if attempt < max_retries - 1:
            sleep(2**attempt)
    raise HttpError(f"request failed after {max_retries} attempts: {url}: {last}")


def download(url: str, dest: str, chunk_size: int = 8192, force: bool = False) -> str:
    """Streamed download with cache-skip (reference shapefile_fetcher.py:50-73,
    url_fetcher.py:39-57: skip when target exists unless force)."""
    import os

    if os.path.exists(dest) and not force:
        return dest
    os.makedirs(os.path.dirname(dest) or ".", exist_ok=True)
    tmp = dest + ".part"
    with urllib.request.urlopen(url) as resp, open(tmp, "wb") as f:
        while True:
            chunk = resp.read(chunk_size)
            if not chunk:
                break
            f.write(chunk)
    import os as _os

    _os.replace(tmp, dest)
    return dest
