"""REST/HTTP JSON source (reference S1-S3).

The reference fetches https://jsonplaceholder.typicode.com/users driver-side
with a 30 s timeout and flattens nested records in a Python loop (reference
lambda_functions/data_extractor.py:31-58). Spark-first translation:

- the fetch stays driver-side for a single small endpoint (S1) — there is no
  native Spark HTTP source, and 10 records do not need a cluster;
- the flatten becomes a *pure projection* over a typed nested StructType —
  ``col("address.geo.lat").alias("address_lat")`` — no Python loop, no UDF
  (S3);
- for ingestion at scale (many endpoints/pages), ``distributed_fetch`` maps
  an endpoint DataFrame through Arrow-batched ``mapInPandas`` so the HTTP
  work itself is distributed and bounded per task.
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

DEFAULT_URL = "https://jsonplaceholder.typicode.com/users"
FETCH_TIMEOUT_SECONDS = 30  # reference data_extractor.py:31


def users_schema() -> T.StructType:
    """Nested source schema (transient, pre-flatten), nullable-by-default —
    missing nested fields degrade to NULL exactly like the reference's
    chained .get(..., {}) (reference data_extractor.py:47-55)."""
    geo = T.StructType(
        [T.StructField("lat", T.StringType()), T.StructField("lng", T.StringType())]
    )
    address = T.StructType(
        [
            T.StructField("street", T.StringType()),
            T.StructField("suite", T.StringType()),
            T.StructField("city", T.StringType()),
            T.StructField("zipcode", T.StringType()),
            T.StructField("geo", geo),
        ]
    )
    company = T.StructType(
        [
            T.StructField("name", T.StringType()),
            T.StructField("catchPhrase", T.StringType()),
            T.StructField("bs", T.StringType()),
        ]
    )
    return T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("username", T.StringType()),
            T.StructField("email", T.StringType()),
            T.StructField("phone", T.StringType()),
            T.StructField("website", T.StringType()),
            T.StructField("address", address),
            T.StructField("company", company),
        ]
    )


def fetch_users(url: str = DEFAULT_URL, timeout: int = FETCH_TIMEOUT_SECONDS) -> list[dict]:
    """Driver-side GET -> list of user dicts (reference S1/S2 semantics:
    fixed timeout, raise on HTTP error)."""
    import requests  # imported lazily; tests inject fixtures instead

    response = requests.get(url, timeout=timeout)
    response.raise_for_status()
    return response.json()


def records_to_df(spark: SparkSession, records: list[dict]) -> DataFrame:
    """Nested records -> typed nested DataFrame. JSON round-trip ensures the
    schema is applied by name (createDataFrame on dicts is positional)."""
    rdd_less = [json.dumps(r) for r in records]
    return spark.read.schema(users_schema()).json(
        spark.sparkContext.parallelize(rdd_less or [""], numSlices=1)
    )


def flatten_users(df: DataFrame) -> DataFrame:
    """users{address{geo{}},company{}} -> 15 flat columns; the 16th
    (extraction_timestamp) is ingestion-time enrichment (ingest.enrich).

    The 16-column flatten (reference data_extractor.py:39-58) as pure
    projections — Catalyst folds these into the scan; no record-level Python.
    """
    return df.select(
        F.col("id"),
        F.col("name"),
        F.col("username"),
        F.col("email"),
        F.col("phone"),
        F.col("website"),
        F.col("address.street").alias("address_street"),
        F.col("address.suite").alias("address_suite"),
        F.col("address.city").alias("address_city"),
        F.col("address.zipcode").alias("address_zipcode"),
        F.col("address.geo.lat").alias("address_lat"),
        F.col("address.geo.lng").alias("address_lng"),
        F.col("company.name").alias("company_name"),
        F.col("company.catchPhrase").alias("company_catchphrase"),
        F.col("company.bs").alias("company_bs"),
    )


def distributed_fetch_raw(
    spark: SparkSession,
    endpoints: list[str],
    fetch: Callable[[str], list[dict]] | None = None,
    strict: bool = False,
) -> DataFrame:
    """Distribute URLs and fetch inside mapInPandas (one HTTP call per
    endpoint row, whole-batch Arrow I/O), returning ``(url, body, error)``.

    Per-endpoint failures are captured in the explicit ``error`` column
    (``body`` NULL) rather than encoded into the body, so callers can route
    or retry them — nothing disappears in a downstream parse. With
    ``strict=True`` a failure raises inside the task instead, so Spark's
    task retry handles transient endpoint errors and the job fails loudly
    on persistent ones.

    ``fetch`` is injectable for tests / offline runs; default is the
    requests-based fetch_users.
    """
    fetcher = fetch or fetch_users
    urls = spark.createDataFrame([(u,) for u in endpoints], "url string")

    def worker(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            bodies, errors = [], []
            for url in pdf["url"]:
                try:
                    bodies.append(json.dumps(fetcher(url)))
                    errors.append(None)
                except Exception as exc:  # noqa: BLE001 — per-endpoint isolation
                    if strict:
                        raise RuntimeError(f"fetch failed for {url}: {exc}") from exc
                    bodies.append(None)
                    errors.append(f"{type(exc).__name__}: {exc}")
            yield pd.DataFrame({"url": pdf["url"], "body": bodies, "error": errors})

    return urls.repartition(max(1, min(len(endpoints), 64))).mapInPandas(
        worker, schema="url string, body string, error string"
    )


def distributed_fetch(
    spark: SparkSession,
    endpoints: list[str],
    fetch: Callable[[str], list[dict]] | None = None,
    on_error: str = "fail",
) -> DataFrame:
    """Scale path for many endpoints: fetch distributed, parse into the
    nested users schema.

    ``on_error`` controls failed endpoints:

    - ``"fail"`` (default): the fetching task raises, so Spark retries it
      and the job fails loudly if the endpoint stays down — an ingestion
      run never silently produces a partial dataset.
    - ``"skip"``: failed endpoints are dropped from the parsed output; use
      ``distributed_fetch_raw`` to observe and route them.
    """
    if on_error not in ("fail", "skip"):
        raise ValueError(f"on_error={on_error!r}; expected 'fail' or 'skip'")
    raw = distributed_fetch_raw(
        spark, endpoints, fetch=fetch, strict=(on_error == "fail")
    )
    # A body that fetched fine but is NOT a JSON array of users parses to
    # NULL (PERMISSIVE mode) and explode(NULL) drops the endpoint — the
    # silent-partial outcome on_error='fail' promises to prevent. Surface
    # parse failures into the error channel before the explode.
    parsed = raw.withColumn(
        "__parsed", F.from_json("body", T.ArrayType(users_schema()))
    ).withColumn(
        "error",
        F.coalesce(
            F.col("error"),
            F.when(
                F.col("body").isNotNull() & F.col("__parsed").isNull(),
                F.lit("ParseError: body is not a JSON array of user records"),
            ),
        ),
    )
    if on_error == "fail":
        # Materialize ONCE before validating: without this, the validation
        # collect() runs the fetch job and the returned DataFrame re-executes
        # it on the caller's first action — every endpoint hit twice (a real
        # cost on non-idempotent/paid APIs) and the returned data would be a
        # second, unvalidated fetch (TOCTOU). localCheckpoint pins the
        # fetched partitions so both the check and the caller read the same
        # single fetch.
        parsed = parsed.localCheckpoint(eager=True)
        bad = [r.url for r in parsed.filter(F.col("error").isNotNull()).select("url").collect()]
        if bad:
            raise RuntimeError(f"unparseable response body from endpoints: {bad}")
    users = (
        parsed.filter(F.col("error").isNull())
        .select(F.explode("__parsed").alias("u"))
        .select("u.*")
    )
    return users


# --- Spark 4 Python Data Source API variant ---------------------------------
# The scale path SURVEY.md §2.1 S1 names: a first-class pluggable source, so
# `spark.read.format("http_json").option("urls", ...)` behaves like any other
# source — one input partition PER ENDPOINT, fetched executor-side, with
# planning (partition listing) separated from IO the way Spark expects.
# `distributed_fetch` above remains the ad-hoc mapInPandas variant; this is
# the registered-catalog-citizen form.

try:  # pyspark >= 4.0
    from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

    class _UrlPartition(InputPartition):
        def __init__(self, url: str):
            self.url = url

    class HttpJsonReader(DataSourceReader):
        def __init__(self, options: dict):
            # Newline-separated: commas are legal inside URLs (query
            # strings), newlines are not — the writer side joins with "\n".
            self._urls = [u for u in options.get("urls", "").splitlines() if u]
            self._timeout = float(options.get("timeout", FETCH_TIMEOUT_SECONDS))

        def partitions(self):
            # one fetch per task -> endpoint parallelism == partition count;
            # Spark schedules/retries each endpoint independently
            return [_UrlPartition(u) for u in self._urls]

        def read(self, partition):
            import urllib.request

            with urllib.request.urlopen(partition.url, timeout=self._timeout) as r:
                body = r.read().decode("utf-8")
            records = json.loads(body)
            if isinstance(records, dict):
                records = [records]
            for rec in records:
                yield (partition.url, json.dumps(rec, sort_keys=True))

    class HttpJsonDataSource(DataSource):
        """``format("http_json")``: JSON-over-HTTP as a native Spark source.

        Emits (source_url, value) rows — one per top-level JSON record —
        leaving typing to ``from_json`` + the flatten projection, so the
        source stays schema-agnostic and the typed path is shared with the
        driver-side fetch.
        """

        @classmethod
        def name(cls):
            return "http_json"

        def schema(self):
            return "source_url string, value string"

        def reader(self, schema):
            return HttpJsonReader(self.options)

    def register_http_source(spark: SparkSession) -> None:
        spark.dataSource.register(HttpJsonDataSource)

except ImportError:  # pragma: no cover - pyspark < 4 fallback
    HttpJsonDataSource = None  # type: ignore[assignment]

    def register_http_source(spark: SparkSession) -> None:
        raise NotImplementedError("Python Data Source API requires pyspark >= 4.0")


def read_http_json(spark: SparkSession, urls: list[str]) -> DataFrame:
    """Read one or more JSON endpoints through the registered source."""
    register_http_source(spark)
    return (
        spark.read.format("http_json").option("urls", "\n".join(urls)).load()
    )
