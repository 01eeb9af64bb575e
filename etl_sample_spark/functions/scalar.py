"""Scalar column functions from the reference, re-expressed as Catalyst
expressions (SURVEY §2.5).

Citations into ``Sample-Json-to-SQL-Full-Pipeline-EO-10-03-2019.py``
(alias ``pipeline.py``) mark which reference behavior each function
reproduces.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def mask_account(account: Column) -> Column:
    """Account masking: keep everything after the first 3 chars, prefix
    with ``'XXXX'``.

    Reference: ``'XXXX' + x['account'][3:]`` (pipeline.py:115,494).
    NOTE: the reference also applies the same expression to a whole pandas
    *Series* at pipeline.py:94,471 which slices rows, not chars — a bug.
    We implement the per-value intent.
    """
    return F.concat(F.lit("XXXX"), F.substring(account, 4, 2147483647))


def reassemble_compact_timestamp(date_part: Column, time_part: Column) -> Column:
    """Reassemble compact ``YYYYMMDD`` + ``HHMMSS`` strings into a real
    timestamp.

    Reference does this with six string slices into the odd format
    ``'YYYY-MM-DD HH:MM.SS'`` (pipeline.py:162); the engine normalizes to
    TimestampType so downstream date logic is native. try_to_timestamp:
    a malformed (schema-valid) input yields NULL instead of throwing
    CANNOT_PARSE_TIMESTAMP under default ANSI mode — the reference's
    try/except tolerance (r11 review).
    """
    return F.try_to_timestamp(F.concat(date_part, time_part), F.lit("yyyyMMddHHmmss"))


def coalesce_chain(*sources: Column, default: str = "Not specified") -> Column:
    """Multi-source fallback: first non-null wins, else a literal default.

    Reference: customer_name resolution tries ``BankScrapeData.name``,
    then ``CustomerInformation.FirstName+LastName``, then
    ``TU_FFR_Report[0].Names``, else ``'Not specified'``
    (pipeline.py:378-387); ``Credit_Member_ID`` falls back to
    ``'Not found'`` (pipeline.py:399-402).
    """
    return F.coalesce(*sources, F.lit(default))
