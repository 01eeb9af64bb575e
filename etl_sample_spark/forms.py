"""Normalization specs for the four reference document forms — the
declarative replacement for bankpipe / creditpipe / jsonpipe / recpipe
(``Sample-Json-to-SQL-Full-Pipeline-EO-10-03-2019.py``, cited per table).

Output table names and FK column names (including the reference's
inconsistent casings — ``Report_date`` vs ``Report_Date`` vs ``sf_id``)
are preserved exactly so a downstream consumer of the reference's star
schema sees identical shapes.

Documented reference bugs handled here:
- account masking (:94,471) slices a whole pandas Series instead of each
  string; we implement the per-value intent ``'XXXX' + account[3:]``
  (same as the correct per-row version at :115,494).
- jsonpipe's ``reg_items`` (:640) reads ``data_dict['TU_FFR_Report']``
  where every sibling reads ``data_dict['CreditReportData'][...]`` — the
  path never exists in Form A, the bare ``except`` always fires, and the
  table is never written by jsonpipe. We reproduce the observable
  behavior: ``reg_items`` is emitted only by the credit form.
- creditpipe's ``Report_Date`` (:162) reassembles ``Date``+``Time`` into
  the odd string ``'YYYY-MM-DD HH:MM.SS'``; the engine normalizes to a
  real timestamp (SURVEY §2.5 F3).
"""

from __future__ import annotations

from etl_sample_spark.normalize import TableSpec

_MASK = "concat('XXXX', substring(account.account, 4))"

# The 12 exploded TU_FFR child sections shared by creditpipe (:186-306)
# and jsonpipe (:527-655): (sink table name, section field).
CREDIT_SECTIONS = (
    ("bankruptcy", "Bankruptcies"),
    ("trades", "Trades"),
    ("credit_details", "CreditSummaryDetails"),
    ("score_products", "ScoreProducts"),
    ("bankings", "Bankings"),
    ("employments", "Employments"),
    ("collections", "Collections"),
    ("inquiries", "Inquiries"),
    ("legals", "Legals"),
    ("consumer_statements", "ConsumerStatements"),
    ("misc_statements", "MiscellaneousStatements"),
    ("reg_items", "RegisteredItems"),
)


def bank_form_specs() -> list[TableSpec]:
    """Form B → bank_scrape_info, misc_contact, bank_account, transactions
    (bankpipe :33-147). ``sf_id`` is derived from the filename by the
    reader (:35 → sources.documents)."""
    return [
        # :41-54 — top-level scalars minus the nested payloads
        TableSpec(
            name="bank_scrape_info",
            root=True,
            drop=("contacts", "accounts", "sf_id"),
            extra={"SF_ID": "sf_id", "Report_date": "complete_datetime"},
        ),
        # :56-66
        TableSpec(
            name="misc_contact",
            explode=(("contacts", "contact"),),
            extra={"name": "name", "SF_ID": "sf_id", "Report_date": "complete_datetime"},
        ),
        # :70-103 — statistics map pluck (:76-92) + masking intent (:94)
        TableSpec(
            name="bank_account",
            explode=(("accounts", "account"),),
            drop=("statistics", "transactions"),
            extra={
                "mean_close": "account.statistics.mean_closing_balance",
                "mean_close_30": "account.statistics.mean_closing_balance_30",
                "mask_id": _MASK,
                "SF_ID": "sf_id",
                "Report_date": "complete_datetime",
            },
        ),
        # :107-126 — nested explode with per-account key carry
        TableSpec(
            name="transactions",
            explode=(("accounts", "account"), ("transactions", "txn")),
            extra={
                "account_id": "CAST(account.account AS STRING)",
                "mask_id": _MASK,
                "sf_id": "sf_id",
                "Report_Date": "CAST(complete_datetime AS STRING)",
            },
        ),
    ]


def credit_form_specs() -> list[TableSpec]:
    """Form C → base_credit + 13 child tables (creditpipe :154-366)."""
    # :162 — compact Date+Time reassembly, normalized to TimestampType.
    # try_to_timestamp: under default ANSI mode a malformed (schema-
    # valid, so unquarantined) Date/Time string would otherwise throw
    # CANNOT_PARSE_TIMESTAMP and crash the corpus pass — the reference's
    # try/except tolerated it (r11 review); null is the faithful result.
    report_date = "try_to_timestamp(concat(Date, Time), 'yyyyMMddHHmmss')"
    member = "CAST(MemberCode AS STRING)"
    specs = [
        # :165-184
        TableSpec(
            name="base_credit",
            root=True,
            drop=("TU_FFR_Report", "sf_id"),
            required="TU_FFR_Report IS NOT NULL",
            extra={
                "SF_ID": "sf_id",
                "Credit_Member_ID": member,
                "TU_FFR_HIT": "TU_FFR_Report[0].Hit",
                "Report_Date": report_date,
                # :175-178 — absent OnFileDate → null (np.nan in the ref)
                "FFR_filedate": "TU_FFR_Report[0].OnFileDate",
            },
        ),
        # :207-213 — CreditSummary is a struct, not an array
        TableSpec(
            name="credit_summary",
            flatten="TU_FFR_Report[0].CreditSummary",
            extra={"Credit_Member_ID": member, "Report_Date": report_date},
        ),
    ]
    # :186-306 — one exploded child table per section, each FK-stamped
    for table, section in CREDIT_SECTIONS:
        specs.append(
            TableSpec(
                name=table,
                explode=((f"TU_FFR_Report[0].{section}", "item"),),
                extra={"Credit_Member_ID": member, "Report_Date": report_date},
            )
        )
    return specs


def combined_form_specs() -> list[TableSpec]:
    """Form A → master_table + customer_info + bank tables + credit tables
    (jsonpipe :372-763)."""
    rep = "CreditReportData.TU_FFR_Report"
    # :378-387 — 3-level name fallback; concat null-propagates exactly like
    # the reference's KeyError → except chain
    customer_name = (
        "coalesce(BankScrapeData.name, "
        "concat(CustomerInformation.FirstName, ' ', CustomerInformation.LastName), "
        f"concat({rep}[0].Names.FirstName, ' ', {rep}[0].Names.LastName), "
        "'Not specified')"
    )
    member = "coalesce(CreditReportData.MemberCode, 'Not found')"  # :399-402
    # Shared-table type contract (r11 review): base_credit /
    # credit_summary / the credit children are written by BOTH forms
    # into the same sinks, and credit_form_specs emits Report_Date as
    # TimestampType — so this form must too, or a mixed-form batch
    # appends INT64 and BYTE_ARRAY into one parquet column and every
    # later read fails. (The bank-side tables' lowercase Report_date
    # stays a raw string: they are not shared with the credit form and
    # keep the reference's shape.)
    report_date = "try_to_timestamp(CreatedOnDate)"
    specs = [
        # :391-404
        TableSpec(
            name="master_table",
            root=True,
            drop=("BankScrapeData", "CustomerInformation", "CreditReportData", "Recommendations", "sf_id"),
            extra={"name": customer_name, "Credit_Member_ID": member},
        ),
        # :406-411
        TableSpec(
            name="customer_info",
            flatten="CustomerInformation",
            extra={"SF_ID": "SalesforceID", "Report_date": "CreatedOnDate"},
        ),
        # :414-425
        TableSpec(
            name="misc_contact",
            explode=(("BankScrapeData.contacts", "contact"),),
            extra={
                "name": "BankScrapeData.name",
                "SF_ID": "SalesforceID",
                "Report_date": "CreatedOnDate",
            },
        ),
        # :428-442
        TableSpec(
            name="bank_scrape_info",
            flatten="BankScrapeData",
            drop=("contacts", "accounts"),
            extra={"SF_ID": "SalesforceID", "Report_date": "CreatedOnDate"},
        ),
        # :445-480
        TableSpec(
            name="bank_account",
            explode=(("BankScrapeData.accounts", "account"),),
            drop=("statistics", "transactions"),
            extra={
                "mean_close": "account.statistics.mean_closing_balance",
                "mean_close_30": "account.statistics.mean_closing_balance_30",
                "mask_id": _MASK,
                "SF_ID": "SalesforceID",
                "Report_date": "CreatedOnDate",
            },
        ),
        # :483-501
        TableSpec(
            name="transactions",
            explode=(("BankScrapeData.accounts", "account"), ("transactions", "txn")),
            extra={
                "account_id": "CAST(account.account AS STRING)",
                "Report_Date": "CAST(CreatedOnDate AS STRING)",
                "mask_id": _MASK,
                "sf_id": "CAST(SalesforceID AS STRING)",
            },
        ),
        # :504-522
        TableSpec(
            name="base_credit",
            flatten="CreditReportData",
            drop=("TU_FFR_Report",),
            required=f"{rep} IS NOT NULL",
            extra={
                "SF_ID": "SalesforceID",
                "Credit_Member_ID": member,
                "TU_FFR_HIT": f"{rep}[0].Hit",
                "Report_Date": report_date,
                "FFR_filedate": f"{rep}[0].OnFileDate",
            },
        ),
        # :548-556
        TableSpec(
            name="credit_summary",
            flatten=f"{rep}[0].CreditSummary",
            extra={"SF_ID": "SalesforceID", "Report_Date": report_date},
        ),
        # :648-655
        TableSpec(
            name="reccomendations",
            explode=(("Recommendations", "rec"),),
            extra={"SF_ID": "SalesforceID", "Report_Date": "CreatedOnDate"},
        ),
    ]
    # :527-645 — jsonpipe stamps SF_ID + Report_Date on the credit children
    # (creditpipe stamps Credit_Member_ID instead). reg_items excluded: dead
    # path in jsonpipe (:640 reads the wrong root — see module docstring).
    for table, section in CREDIT_SECTIONS:
        if table == "reg_items":
            continue
        specs.append(
            TableSpec(
                name=table,
                explode=((f"{rep}[0].{section}", "item"),),
                extra={"SF_ID": "SalesforceID", "Report_Date": report_date},
            )
        )
    return specs


def action_form_specs() -> list[TableSpec]:
    """Form D → reccomendation_action (recpipe :19-30): whole doc, one row."""
    return [TableSpec(name="reccomendation_action", root=True, drop=("sf_id",))]
