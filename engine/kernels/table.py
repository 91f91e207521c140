"""Table extraction (priority 2) — SURVEY.md §2.4 T1-T6.

Replicates ``/root/reference/src/parsers/html_parser/table_parser.py``
in its deterministic (no sentence-transformer) configuration:

* T1 table detect (``:54-57``);
* T2 header extraction: ``thead tr`` → first ``tr`` with ``th`` →
  first ``tr`` (``:100-133``);
* T3 attribute→header matching: exact case-insensitive wins outright;
  substring containment scores 0.8 (below the 0.7 class-default
  threshold, so partial matches alone are DROPPED — observable quirk,
  ``:159-171``); the semantic tier is model-gated and absent here;
* T4 row extraction with ""-fill and all-empty-row drop (``:198-224``);
* T5 text cleaning (whitespace collapse, nbsp, en/em dash) (``:226-239``);
* T6 multi-table concat (``:59-83``).
"""

from __future__ import annotations

from typing import Dict, List

from engine.dom import Node

# Class default (ref table_parser.py:28); the orchestrator passes 0.6
# (ref intelligent_parser.py:28,50) — the orchestrator value is what
# production observes, so partial matches (0.8) survive there.
DEFAULT_SIMILARITY_THRESHOLD = 0.7


def clean_text(text: str) -> str:
    """T5 — whitespace collapse, nbsp and en/em dashes normalized."""
    if not text:
        return ""
    cleaned = " ".join(text.split())
    cleaned = cleaned.replace("\xa0", " ")
    cleaned = cleaned.replace("–", "-")
    cleaned = cleaned.replace("—", "-")
    return cleaned.strip()


def is_table(root: Node) -> bool:
    """T1."""
    return len(root.find_all("table")) > 0


def extract_headers(table: Node) -> List[str]:
    """T2."""
    header_rows: List[Node] = []
    thead = table.find("thead")
    if thead:
        header_rows = thead.find_all("tr")
    if not header_rows:
        first_row = table.find("tr")
        if first_row and first_row.find("th"):
            header_rows = [first_row]
    if not header_rows:
        first_row = table.find("tr")
        if first_row:
            header_rows = [first_row]
    headers: List[str] = []
    if header_rows:
        for cell in header_rows[0].find_all(["th", "td"]):
            headers.append(clean_text(cell.get_text()))
    return headers


def match_attributes_to_headers(attributes: List[str], headers: List[str],
                                similarity_threshold: float,
                                matcher=None) -> Dict[str, int]:
    """T3 — exact match wins; substring containment scores 0.8; the
    semantic tier (ref table_parser.py:166-171,175-196) runs only when
    neither fired AND a matcher is plugged in."""
    mapping: Dict[str, int] = {}
    for attribute in attributes:
        best_match_idx = None
        best_score = 0.0
        for i, header in enumerate(headers):
            if attribute.lower() == header.lower():
                mapping[attribute] = i
                best_match_idx = i
                break
            if attribute.lower() in header.lower() or header.lower() in attribute.lower():
                if best_match_idx is None:
                    best_match_idx = i
                    best_score = 0.8
        if best_match_idx is None and matcher is not None and headers:
            best_match_idx, best_score = matcher.best_match(attribute, headers)
        if best_match_idx is not None and attribute not in mapping \
                and best_score >= similarity_threshold:
            mapping[attribute] = best_match_idx
    return mapping


def extract_rows_data(table: Node, header_mapping: Dict[str, int]) -> List[Dict[str, str]]:
    """T4 — all rows after the first; missing cells → ""; drop empty rows."""
    rows_data: List[Dict[str, str]] = []
    all_rows = table.find_all("tr")
    data_rows = all_rows[1:] if len(all_rows) > 1 else []
    for row in data_rows:
        cells = row.find_all(["td", "th"])
        row_data: Dict[str, str] = {}
        for attribute, header_idx in header_mapping.items():
            if header_idx < len(cells):
                row_data[attribute] = clean_text(cells[header_idx].get_text())
            else:
                row_data[attribute] = ""
        if any(value.strip() for value in row_data.values()):
            rows_data.append(row_data)
    return rows_data


def parse_tables(root: Node, entity, attributes: List[str],
                 similarity_threshold: float = 0.6,
                 matcher=None) -> List[Dict[str, str]]:
    """T6 — concat per-table results over an already-parsed DOM."""
    tables = root.find_all("table")
    if not tables:
        return []
    all_results: List[Dict[str, str]] = []
    for table in tables:
        headers = extract_headers(table)
        if not headers:
            continue
        mapping = match_attributes_to_headers(attributes, headers,
                                              similarity_threshold, matcher)
        all_results.extend(extract_rows_data(table, mapping))
    return all_results
