"""Expense roll-up per page (A7) with money parsing (C2-C4) — SURVEY.md §2.4.

Reference: stack.ExpenseSaver.ts. One Textract ExpenseDocument == one page;
the saver builds per page: first-match TOTAL/AMOUNT_DUE/AMOUNT_PAID summary
fields (ts:65-82), distinct-accumulated receipt info (ts:84-109), and line
items where a missing/zero PRICE drops the row (ts:140-144, ``if (!price)``).
Output strings are ``toFixed(2)`` money with falsy fields omitted
(ts:206-244).

Span encoding (FIXTURES.md): ``expense_field`` spans carry JSON
``{Page, Type, Label, Value}``; ``expense_item`` spans carry
``{Page, Group, Item, Fields:[{Type, Label, Value}]}``.
"""

from __future__ import annotations

import json

from ..functions.scalars import parse_document_value, to_fixed_2


def _is_type(field: dict, type_: str) -> bool:
    """isFieldType (ExpenseSaver.ts:59-61), case-insensitive."""
    t = field.get("Type")
    return t is not None and t.upper() == type_.upper()


def _has_label(field: dict, label: str) -> bool:
    """hasLabel (ExpenseSaver.ts:121-123)."""
    lab = field.get("Label")
    return lab is not None and lab.upper() == label.upper()


def _first_value(fields: list[dict], type_: str) -> str | None:
    for f in fields:
        if _is_type(f, type_):
            return f.get("Value")
    return None


def _all_values(fields: list[dict], type_: str) -> list[str]:
    """getAllValuesForType (ts:84-94): insertion-ordered distinct truthy
    values."""
    seen = set()
    out = []
    for f in fields:
        if _is_type(f, type_):
            v = f.get("Value")
            if v and v not in seen:
                seen.add(v)
                out.append(v)
    return out


def _other_field(fields: list[dict], label: str) -> str | None:
    """getOtherField (ts:125-132)."""
    for f in fields:
        if _is_type(f, "OTHER") and _has_label(f, label):
            return f.get("Value")
    return None


def _line_item_expense(fields: list[dict]) -> dict | None:
    """One LineItem -> Expense (ts:139-158); falsy price drops the item."""
    price = parse_document_value(_first_value(fields, "PRICE"))
    if not price:
        return None
    return {
        "price": price,
        "productCode": _first_value(fields, "PRODUCT_CODE"),
        "description": _first_value(fields, "ITEM"),
        "unitPrice": parse_document_value(_first_value(fields, "UNIT_PRICE")),
        "diagnosisCode": _other_field(fields, "Diagnosis"),
        "provider": _other_field(fields, "provider"),
        "quantity": parse_document_value(_first_value(fields, "QUANTITY")),
    }


def _format_expense(expense: dict) -> dict[str, str]:
    """saveExpenseData's per-expense marshalling (ts:217-240): price always
    toFixed(2); other keys only when truthy; numbers toFixed(2)."""
    result: dict[str, str] = {"price": to_fixed_2(expense["price"])}
    for key, value in expense.items():
        if key == "price":
            continue
        if value:
            result[key] = to_fixed_2(value) if isinstance(value, (int, float)) else value
    return result


def expenses_by_page(spans: list[dict]) -> list[dict]:
    """Full A7 roll-up: per-page ExpenseData, formatted like saveExpenseData
    (ts:206-244). Pages ordered by page number (ExpenseDocuments arrive in
    page order)."""
    summary: dict[int, list[dict]] = {}
    items: dict[int, list[list[dict]]] = {}
    pages_seen: list[int] = []
    for s in spans:
        kind = s.get("kind")
        if kind not in ("expense_field", "expense_item") or not s.get("text"):
            continue
        try:
            payload = json.loads(s["text"])
        except (ValueError, TypeError):
            continue
        if not isinstance(payload, dict):
            continue
        try:
            page = int(payload.get("Page") or 1)
        except (ValueError, TypeError):
            page = 1
        if page not in pages_seen:
            pages_seen.append(page)
        if kind == "expense_field":
            summary.setdefault(page, []).append(payload)
        else:
            fields = payload.get("Fields")
            items.setdefault(page, []).append(
                [f for f in fields if isinstance(f, dict)] if isinstance(fields, list) else []
            )

    out = []
    for page in pages_seen:
        fields = summary.get(page, [])
        total = parse_document_value(_first_value(fields, "TOTAL"))
        paid = parse_document_value(_first_value(fields, "AMOUNT_PAID"))
        due = parse_document_value(_first_value(fields, "AMOUNT_DUE"))
        expenses = []
        for item_fields in items.get(page, []):
            e = _line_item_expense(item_fields)
            if e is not None:
                expenses.append(_format_expense(e))
        out.append(
            {
                "totalExpenses": to_fixed_2(total if total is not None else 0),
                "totalPaid": to_fixed_2(paid if paid is not None else 0),
                "totalDue": to_fixed_2(due if due is not None else 0),
                "receiptInfo": {
                    "accountNumbers": _all_values(fields, "ACCOUNT_NUMBER"),
                    "receiver": {
                        "names": _all_values(fields, "RECEIVER_NAME"),
                        "addresses": _all_values(fields, "RECEIVER_ADDRESS"),
                    },
                    "provider": {
                        "names": _all_values(fields, "VENDOR_NAME"),
                        "addresses": _all_values(fields, "VENDOR_ADDRESS"),
                    },
                },
                "expenses": expenses,
            }
        )
    return out
