"""Pipeline runner + SQL script splitting (SURVEY.md §2.12 C1-C6, §2.2 K3).

The reference's physical plan is an Airflow DAG of linearly-chained tasks
(export_svg.py:703-716) with a Slack failure callback (helper.py:7-38) and a
13-statement CTAS script run as one job (export_svg.py:270-701). The
Spark-native restatement: ordered stage functions, an alert hook, and a
statement splitter feeding sequential ``spark.sql`` calls (Spark executes one
statement per call).
"""

from __future__ import annotations

import re
import time
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import SparkSession


@dataclass
class StageResult:
    name: str
    seconds: float
    error: Exception | None = None


@dataclass
class Pipeline:
    """C1: ordered stages, each one Spark action; C5: failure alert hook.

    ``on_failure(stage_name, exc)`` plays helper.py's task_fail_slack_alert
    role (dag/task/error context to a webhook); here it's an injectable
    callable so deployments can wire any alerting transport.
    """

    name: str
    stages: list[tuple[str, Callable[[SparkSession], None]]] = field(
        default_factory=list
    )
    on_failure: Callable[[str, Exception], None] | None = None

    def stage(self, name: str):
        """Decorator: ``@pipe.stage("ingest")`` appends in declaration order
        (the reference's ``>>`` chain, export_svg.py:703-716)."""

        def wrap(fn: Callable[[SparkSession], None]):
            self.stages.append((name, fn))
            return fn

        return wrap

    def run(self, spark: SparkSession, fail_fast: bool = True) -> list[StageResult]:
        results: list[StageResult] = []
        for name, fn in self.stages:
            t0 = time.perf_counter()
            try:
                fn(spark)
                results.append(StageResult(name, time.perf_counter() - t0))
            except Exception as exc:  # noqa: BLE001 — alert then decide
                results.append(StageResult(name, time.perf_counter() - t0, exc))
                if self.on_failure is not None:
                    self.on_failure(name, exc)
                if fail_fast:
                    raise
        return results


def make_alert_hook(
    transport: Callable[[dict], None],
    pipeline_name: str,
    headline: str = "Task failed",
    env_level: str = "prod",
    log_url_base: str = "",
    clock: Callable[[], str] | None = None,
) -> Callable[[str, Exception], None]:
    """C5 default formatter: the reference's Slack failure payload shape.

    Mirrors helper.py:7-38 (slack_alert → _internal): a factory that closes
    over the destination and returns a ``(stage, exc)`` callback producing
    the same fields — env level + headline line, *Dag* (pipeline name),
    *Task* (stage), *Execution Datetime* (UTC ISO, the reference's
    ``dt.utcnow().strftime('%Y-%m-%dT%H:%M:%S+00:00')``), *Log Url*. The
    transport is any ``dict -> None`` callable (the reference's
    SlackWebhookOperator.execute analogue): webhook POST in a deployment, a
    list.append in tests. ``clock`` is injectable so tests pin the
    timestamp.
    """

    def hook(stage: str, exc: Exception) -> None:
        exec_dt = (
            clock()
            if clock is not None
            else time.strftime("%Y-%m-%dT%H:%M:%S+00:00", time.gmtime())
        )
        payload = {
            "message": (
                f"[{env_level}] {headline}\n"
                f"*Dag*: {pipeline_name}\n"
                f"*Task*: {stage}\n"
                f"*Execution Datetime*: {exec_dt}\n"
                f"*Log Url*: {log_url_base}/{pipeline_name}/{stage}\n"
                f"*Error*: {exc}"
            ),
            "dag": pipeline_name,
            "task": stage,
            "exec_date": exec_dt,
            "log_url": f"{log_url_base}/{pipeline_name}/{stage}",
            "username": "pipeline",
        }
        transport(payload)

    return hook


def split_sql_script(script: str) -> list[str]:
    """K3: split a multi-statement SQL script into executable statements.

    The reference ships 13 semicolon-separated CTAS statements (plus a
    ``#TRANSACT`` marker line) as ONE BigQuery script job
    (export_svg.py:272-694); Spark has no multi-statement exec, so the
    engine splits and runs sequentially. Comment lines (``#...``, ``--...``)
    are dropped; semicolons inside single-quoted strings are respected,
    including SQL-escaped quotes (``''``) within a literal.
    """
    # strip comment-only lines (the reference's "#TRANSACT")
    lines = [
        ln
        for ln in script.splitlines()
        if not re.match(r"\s*(#|--)", ln)
    ]
    text = "\n".join(lines)
    stmts, buf, in_str = [], [], False
    i, n = 0, len(text)
    while i < n:
        ch = text[i]
        if ch == "'":
            if in_str and i + 1 < n and text[i + 1] == "'":
                # doubled quote = escaped quote inside the literal, not a close
                buf.append("''")
                i += 2
                continue
            in_str = not in_str
            buf.append(ch)
        elif ch == ";" and not in_str:
            stmts.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
        i += 1
    stmts.append("".join(buf))
    return [s.strip() for s in stmts if s.strip()]


def run_sql_script(spark: SparkSession, script: str) -> int:
    """Execute each statement of a script in order; returns statement count."""
    stmts = split_sql_script(script)
    for s in stmts:
        spark.sql(s)
    return len(stmts)
