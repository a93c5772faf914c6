"""Correspondence family: email parse (S3), transcript fold (A4/N3),
full-letter text join (A5) — SURVEY.md §2.1/§2.4, §3.2.

Email shaping mirrors TextExtractorEmailResult (lib/text-extractor.ts:35-114):
mailparser's AddressObject.text is the full formatted header value, so
single-header recipients become one-element arrays; missing headers are None;
``date`` is the JS ``toUTCString()`` format. We parse RFC-822 text carried by
an ``email`` span with the Python ``email`` stdlib.

Transcript fold mirrors correspondence-extractor.text-extract.ts:86-91 — a
reduce that yields ONE text with a leading ``\\n`` before every utterance
(including the first).
"""

from __future__ import annotations

import json
from email import message_from_string
from email.utils import parsedate_to_datetime


def _hdr(msg, name: str) -> str | None:
    v = msg.get(name)
    return str(v) if v is not None else None


def _addr_list(msg, name: str) -> list[str] | None:
    """mailparser yields one AddressObject per header; `.text` is the whole
    formatted list -> `[parsed.to.text]` (text-extractor.ts:59-63)."""
    vals = msg.get_all(name)
    if not vals:
        return None
    return [str(v) for v in vals]


def _js_utc_string(date_header: str | None) -> str | None:
    """JS Date.toUTCString(): 'Www, dd Mon yyyy hh:mm:ss GMT'
    (text-extractor.ts:51)."""
    if not date_header:
        return None
    try:
        dt = parsedate_to_datetime(date_header)
    except (ValueError, TypeError):
        return None
    import datetime as _dt

    dt = dt.astimezone(_dt.timezone.utc) if dt.tzinfo else dt.replace(tzinfo=_dt.timezone.utc)
    return dt.strftime("%a, %d %b %Y %H:%M:%S GMT")


def parse_email(raw: str) -> dict:
    """S3: MIME parse -> TextExtractorEmailResult-shaped dict
    (text-extractor.ts:35-114)."""
    msg = message_from_string(raw)
    refs_raw = _hdr(msg, "References")
    references = refs_raw.split() if refs_raw else None

    body = None
    attachments: list[str] = []
    attachments_content: list[dict] = []
    if msg.is_multipart():
        for part in msg.walk():
            if part.is_multipart():
                continue
            filename = part.get_filename()
            payload = part.get_payload(decode=True)
            text = payload.decode("utf-8", "replace") if payload is not None else ""
            if filename:
                attachments.append(filename)
                attachments_content.append({"filename": filename, "content": text})
            elif part.get_content_type() == "text/plain" and body is None:
                body = text
    else:
        payload = msg.get_payload(decode=True)
        body = payload.decode("utf-8", "replace") if payload is not None else msg.get_payload()

    return {
        "messageId": _hdr(msg, "Message-ID"),
        "date": _js_utc_string(_hdr(msg, "Date")),
        "from": _addr_list(msg, "From"),
        "to": _addr_list(msg, "To"),
        "cc": _addr_list(msg, "Cc"),
        "bcc": _addr_list(msg, "Bcc"),
        "subject": _hdr(msg, "Subject"),
        "body": body or None,
        "references": references,
        "attachments": attachments or None,
        "attachmentsWithContent": attachments_content or None,
    }


def parse_transcript(spans: list[dict]) -> list[dict]:
    """Decode transcript_utt spans -> [{Content, Sentiment, ParticipantId}]."""
    out = []
    for s in spans:
        if s.get("kind") == "transcript_utt" and s.get("text"):
            try:
                payload = json.loads(s["text"])
            except (ValueError, TypeError):
                continue
            if isinstance(payload, dict):
                out.append(payload)
    return out


def fold_transcript_text(transcript: list[dict]) -> str:
    """A4: reduce concatenating Content with '\\n', leading separator
    included (text-extract.ts:86-91)."""
    text = ""
    for utt in transcript:
        text = f"{text}\n{utt.get('Content')}"
    return text


def transcript_sentiments(transcript: list[dict]) -> list[str]:
    """N3: insertion-ordered distinct of pre-attached Sentiment fields
    (text-comprehend.ts:20-31; `!== undefined` -> missing key skipped)."""
    seen = set()
    out = []
    for utt in transcript:
        if "Sentiment" not in utt:
            continue
        s = utt["Sentiment"]
        if s not in seen:
            seen.add(s)
            out.append(s)
    return out


def join_lines(lines: list[str]) -> str:
    """A5: extraction.join('\\n') (correspondence-extractor.text-saver.ts:18)."""
    return "\n".join(lines)
