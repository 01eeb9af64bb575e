"""Explicit StructType schemas for the four JSON document forms the
reference processes (FIXTURES.md §A; field accesses cited there into
``Sample-Json-to-SQL-Full-Pipeline-EO-10-03-2019.py``).

The reference infers schemas per document (``pd.read_json``); a corpus
read needs declared schemas because inference over documents with absent
sections is nondeterministic (SURVEY §7 'hard parts'). Missing nested
fields read as null under PERMISSIVE mode — the declarative form of the
reference's try/except tolerance.

The free-form leaf sections (Trades, Bankruptcies, …) carry 2-3 typed
scalar columns each, per FIXTURES.md's fixture guidance — the reference
tabulates them wholesale without naming columns.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)


def _s(*fields: StructField) -> StructType:
    return StructType(list(fields))


def _f(name: str, dtype) -> StructField:
    return StructField(name, dtype, nullable=True)


def _arr(struct: StructType) -> ArrayType:
    return ArrayType(struct, containsNull=True)


# -- shared nested types (FIXTURES.md 'Shared nested types') ---------------

TRANSACTION = _s(
    _f("description", StringType()),
    _f("amount", DoubleType()),
    _f("date", StringType()),
    _f("flags", ArrayType(StringType())),
)

STATISTICS = _s(
    _f("mean_closing_balance", DoubleType()),
    _f("mean_closing_balance_30", DoubleType()),
)

ACCOUNT = _s(
    _f("account", StringType()),
    _f("balance", DoubleType()),
    _f("statistics", STATISTICS),
    _f("transactions", _arr(TRANSACTION)),
)

CONTACT = _s(_f("contact_type", StringType()), _f("value", StringType()))

NAMES = _s(_f("FirstName", StringType()), _f("LastName", StringType()))

TU_FFR_REPORT_ELEM = _s(
    _f("Hit", StringType()),
    _f("OnFileDate", StringType()),
    _f("Names", NAMES),
    _f("Bankruptcies", _arr(_s(_f("CaseNumber", StringType()), _f("FiledDate", StringType()), _f("Amount", DoubleType())))),
    _f("Trades", _arr(_s(_f("TradeDate", StringType()), _f("Balance", DoubleType()), _f("Status", StringType())))),
    _f("CreditSummary", _s(_f("TotalAccounts", IntegerType()), _f("TotalBalance", DoubleType()))),
    _f("CreditSummaryDetails", _arr(_s(_f("Category", StringType()), _f("Count", IntegerType())))),
    _f("ScoreProducts", _arr(_s(_f("Product", StringType()), _f("Score", IntegerType())))),
    _f("Bankings", _arr(_s(_f("Institution", StringType()), _f("AccountType", StringType())))),
    _f("Employments", _arr(_s(_f("Employer", StringType()), _f("Occupation", StringType())))),
    _f("Collections", _arr(_s(_f("Agency", StringType()), _f("Amount", DoubleType())))),
    _f("Inquiries", _arr(_s(_f("InquiryDate", StringType()), _f("Subscriber", StringType())))),
    _f("Legals", _arr(_s(_f("CourtName", StringType()), _f("Amount", DoubleType())))),
    _f("ConsumerStatements", _arr(_s(_f("Statement", StringType())))),
    _f("MiscellaneousStatements", _arr(_s(_f("Statement", StringType())))),
    _f("RegisteredItems", _arr(_s(_f("ItemType", StringType()), _f("Description", StringType())))),
)

# -- Form B: bank scrape (*_bank_scrape.json → bankpipe :33-147) ------------

BANK_SCRAPE_SCHEMA = _s(
    _f("name", StringType()),
    _f("complete_datetime", StringType()),
    _f("contacts", _arr(CONTACT)),
    _f("accounts", _arr(ACCOUNT)),
)

# -- Form C: credit report (*_credit_report.json → creditpipe :154-366) -----

CREDIT_REPORT_SCHEMA = _s(
    _f("Date", StringType()),  # 'YYYYMMDD' (:162)
    _f("Time", StringType()),  # 'HHMMSS'   (:162)
    _f("MemberCode", StringType()),
    _f("ReportType", StringType()),
    _f("TU_FFR_Report", _arr(TU_FFR_REPORT_ELEM)),
)

# -- Form A: combined (default route → jsonpipe :372-763) -------------------

COMBINED_SCHEMA = _s(
    _f("SalesforceID", StringType()),
    _f("CreatedOnDate", StringType()),
    _f("CustomerInformation", _s(_f("FirstName", StringType()), _f("LastName", StringType()), _f("Email", StringType()))),
    _f("BankScrapeData", _s(
        _f("name", StringType()),
        _f("contacts", _arr(CONTACT)),
        _f("accounts", _arr(ACCOUNT)),
    )),
    _f("CreditReportData", _s(
        _f("MemberCode", StringType()),
        _f("ReportType", StringType()),
        _f("TU_FFR_Report", _arr(TU_FFR_REPORT_ELEM)),
    )),
    _f("Recommendations", _arr(_s(_f("action", StringType()), _f("priority", IntegerType())))),
)

# -- Form D: action (*_action.json → recpipe :19-30) ------------------------

ACTION_SCHEMA = _s(
    _f("action", StringType()),
    _f("reason", StringType()),
    _f("created", StringType()),
)
