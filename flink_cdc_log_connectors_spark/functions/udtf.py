"""Python UDTFs (table functions) — the §2.7 UDTF surface.

Spark 4 Python UDTFs return multiple rows per input; the engine registers
two: ``tokenize`` (text → one row per token with position) and
``explode_changelog_ops`` (an op-code expander usable in SQL).  UDTFs are
the slow path (per-row Python) — these exist to complete the API surface;
hot-path equivalents are the Catalyst ``explode(split(...))`` forms.
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf

_TOKEN_RE = re.compile("[^a-z0-9]+")


@udtf(returnType="pos: int, token: string")
class Tokenize:
    """One row per token: SELECT t.* FROM tokenize('Hello World') t."""

    def eval(self, text: str):  # noqa: D102
        if text is None:
            return
        pos = 0
        for tok in _TOKEN_RE.split(text.lower()):
            if tok:
                yield pos, tok
                pos += 1


@udtf(returnType="op: string, label: string")
class ExplodeChangelogOps:
    """Expand an op-code string into (op, human label) rows."""

    _LABELS = {"c": "create", "u": "update", "d": "delete", "r": "snapshot-read"}

    def eval(self, ops: str):  # noqa: D102
        if ops is None:
            return
        for op in ops.split(","):
            op = op.strip()
            if op:
                yield op, self._LABELS.get(op, "unknown")


def register_udtfs(spark) -> None:
    spark.udtf.register("tokenize", Tokenize)
    spark.udtf.register("explode_changelog_ops", ExplodeChangelogOps)
