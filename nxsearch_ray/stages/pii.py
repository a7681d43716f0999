"""PII detection and redaction — vectorized regex scrubbing.

Web-scale training corpora are scrubbed of personally identifying
information before training (emails, phone numbers, IP addresses —
the categories the BigCode/StarCoder and Dolma pipelines redact).
The reference engine has no analogue (it indexes text verbatim);
this stage is part of the training-data operator set layered on top.

Shape of the computation — map-only, zero shuffles, zero Python loops:

* Detection: one `pyarrow.compute.count_substring_regex` per category
  (RE2, non-overlapping left-to-right — the same engine and match
  discipline DuckDB's `regexp_extract_all` uses, so the SQL oracle
  reproduces the counts verbatim).
* Redaction: sequential `pc.replace_substring_regex` passes
  (email -> phone -> ip, fixed order so both engines see the same
  intermediate text).

At 100 TB this is embarrassingly parallel: a stateless batch
transform with no state, no exchange, and output the size of the
input.  The patterns are compiled once per worker process by Arrow's
kernel cache; nothing is per-batch.

The sandbox corpus is clean word soup, so tests and the hash oracle
inject deterministic PII first (`inject_pii` — a page_id-derived
email/phone/IP appended to the text, reproduced bit-identically by
the SQL twin) and then verify the scrubbed text byte-for-byte.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# RE2 syntax, shared verbatim with the DuckDB oracle (both engines
# run RE2).  Keep in sync with pii_oracle_sql().
EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+\d{1,2} \d{3}-\d{3}-\d{4}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

# category -> (pattern, replacement token), applied in this order.
PII_RULES: tuple[tuple[str, str, str], ...] = (
    ("email", EMAIL_RE, "<EMAIL>"),
    ("phone", PHONE_RE, "<PHONE>"),
    ("ip", IPV4_RE, "<IP>"),
)


def inject_pii(batch: pa.Table, *, id_col: str = "page_id",
               text_col: str = "text") -> pa.Table:
    """Deterministically append one email, phone and IP per row,
    derived from the id — the synthetic-PII twin of the SQL CTE in
    ``pii_oracle_sql`` (bit-identical on both sides)."""
    import numpy as np

    ids = batch.column(id_col)
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    iv = ids.to_numpy().astype(np.int64)

    def s64(x: "np.ndarray") -> pa.Array:
        return pc.cast(pa.array(x, type=pa.int64()), pa.string())

    s = s64(iv)
    area = s64(iv % 900 + 100)
    line = s64((iv * 7) % 9000 + 1000)
    ip2 = s64((iv // 7) % 256)
    ip3 = s64(iv % 256)
    ip4 = s64(iv % 254 + 1)
    # (the trailing "" is the element-wise join separator)
    text = pc.binary_join_element_wise(
        batch.column(text_col), " contact-", s,
        "@example.org call +1 555-", area, "-", line,
        " from 10.", ip2, ".", ip3, ".", ip4, " ", "")
    return batch.set_column(
        batch.schema.get_field_index(text_col),
        pa.field(text_col, pa.string()), text)


def detect_pii(batch: pa.Table, *, text_col: str = "text") -> pa.Table:
    """Append one ``n_<category>`` int64 count column per rule."""
    text = batch.column(text_col)
    for name, pattern, _ in PII_RULES:
        n = pc.count_substring_regex(text, pattern).cast(pa.int64())
        batch = batch.append_column(pa.field(f"n_{name}", pa.int64()), n)
    return batch


def redact_pii(batch: pa.Table, *, text_col: str = "text",
               out_col: str = "clean_text") -> pa.Table:
    """Append ``out_col`` = text with every rule's matches replaced by
    its token, applied in PII_RULES order."""
    text = batch.column(text_col)
    for _, pattern, token in PII_RULES:
        text = pc.replace_substring_regex(text, pattern, token)
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    return batch.append_column(pa.field(out_col, pa.string()), text)


def scrub_pii(batch: pa.Table, *, text_col: str = "text") -> pa.Table:
    """Detect + redact in one pass: the production stage fn for
    ``ds.map_batches(scrub_pii, batch_format="pyarrow")``."""
    return redact_pii(detect_pii(batch, text_col=text_col),
                      text_col=text_col)


def pii_inject_sql(text_expr: str, id_expr: str) -> str:
    """DuckDB twin of ``inject_pii`` (same concatenation, same
    arithmetic — `//` is DuckDB integer division)."""
    return (
        f"{text_expr} || ' contact-' || {id_expr} || '@example.org call"
        f" +1 555-' || ({id_expr} % 900 + 100) || '-' ||"
        f" (({id_expr} * 7) % 9000 + 1000) || ' from 10.' ||"
        f" (({id_expr} // 7) % 256) || '.' || ({id_expr} % 256) || '.'"
        f" || ({id_expr} % 254 + 1) || ' '")


def pii_select_sql(text_expr: str) -> str:
    """DuckDB select-list twin of ``scrub_pii`` over ``text_expr``:
    n_email/n_phone/n_ip counts + clean_text."""
    counts = ", ".join(
        f"len(regexp_extract_all({text_expr}, '{pat}'))::BIGINT"
        f" AS n_{name}" for name, pat, _ in PII_RULES)
    redacted = text_expr
    for _, pat, token in PII_RULES:
        redacted = (f"regexp_replace({redacted}, '{pat}',"
                    f" '{token}', 'g')")
    return f"{counts}, {redacted} AS clean_text"
