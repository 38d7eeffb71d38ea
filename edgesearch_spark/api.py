"""Worker-API parity layer: query parsing + response assembly.

Mirrors the reference worker's HTTP surface (SURVEY.md Q1/Q2/Q16/Q19/Q21)
so a user of the reference can move their query strings over unchanged:

  * ``parse_query_params``  — the worker's `t=<mode>_<term>` / `c=` format
    (script/src/main.ts:253-271,349-356): mode ∈ {0,1,2} = require/contain/
    exclude; malformed `t=` → None (worker: 400 "Malformed query");
    continuation clamped ≥ 0, NaN → 0.
  * ``build_query_string`` — the client's normalized serialization
    (client/src/main.ts:27-34): per-mode dedupe + sort, URL-encoded.
  * ``parse_hash_syntax``  — the demo UI hash syntax
    (demo/work-at-microsoft/client/src/script.js:433-462):
    `field:words|~field:words|!field:words|from:N`, `~`=contain,
    `!`=exclude, terms become `{field}_{word}`; `from:` sets continuation;
    unknown fields skipped.
  * ``search_response``    — the worker's JSON body shape
    `{"total":…,"continuation":…,"results":[…]}` (main.ts:405-436;
    no-result shape http.ts:30-31).
"""

from __future__ import annotations

import json
import re
import urllib.parse

from .oracle import Query, SearchResult

# unanchored tail like the worker's /^([012])_([^&]+)/ (script/src/main.ts:253):
# a '&' inside the (decoded) value truncates the term rather than rejecting it
_TERM_RE = re.compile(r"^([012])_([^&]+)")
_HASH_PART_RE = re.compile(r"^([!~]?)([a-z]+):(.*)$")
_WORD_RE = re.compile(r"[a-zA-Z0-9]+")

MODE_NAMES = {0: "require", 1: "contain", 2: "exclude"}


def parse_query_params(t_params: list[str], c_param: str | None = None, k: int = 50) -> Query | None:
    """Worker format: each t= value is `<mode>_<term>`. Returns None on any
    malformed value (reference returns HTTP 400)."""
    modes: dict[int, list[str]] = {0: [], 1: [], 2: []}
    for value in t_params:
        m = _TERM_RE.match(value)
        if not m:
            return None
        modes[int(m.group(1))].append(urllib.parse.unquote(m.group(2)))
    try:
        continuation = max(0, int(c_param)) if c_param else 0
    except ValueError:
        continuation = 0
    return Query.make(require=modes[0], contain=modes[1], exclude=modes[2], continuation=continuation, k=k)


def parse_query_url(url: str, k: int = 50) -> Query | None:
    """Parse a full `/search?...` URL or bare query string."""
    qs = urllib.parse.urlparse(url).query or (url if "=" in url else "")
    # keep blanks: a blank `t=` must reach the term regex and fail → 400,
    # matching the worker (its regex cannot match an empty value)
    params = urllib.parse.parse_qsl(qs, keep_blank_values=True)
    ts = [v for key, v in params if key == "t"]
    cs = [v for key, v in params if key == "c"]
    return parse_query_params(ts, cs[0] if cs else None, k=k)


def build_query_string(q: Query) -> str:
    """Client-normalized serialization (dedupe+sort per mode, client Q19)."""
    parts = [f"c={q.continuation}"]
    for mode, terms in ((0, q.require), (1, q.contain), (2, q.exclude)):
        for t in sorted(set(terms)):
            parts.append(f"t={mode}_{urllib.parse.quote(t, safe='')}")
    return "&".join(parts)


def parse_hash_syntax(hash_str: str, fields: set[str], k: int = 50) -> Query:
    """Demo-UI `#field:a+b|~field:c|!field:d|from:N` syntax → Query.
    Terms are tokenized (alnum runs, lowercased) and field-prefixed."""
    modes: dict[int, list[str]] = {0: [], 1: [], 2: []}
    continuation = 0
    for part in hash_str.lstrip("#").split("|"):
        if not part:
            continue
        m = _HASH_PART_RE.match(part)
        if not m:
            continue
        sign, field, raw = m.groups()
        mode = {"!": 2, "~": 1}.get(sign, 0)
        text = urllib.parse.unquote(raw.replace("+", "%20"))
        if field == "from":
            try:
                continuation = int(text)
            except ValueError:
                continuation = 0
            continue
        if field not in fields:
            continue
        words = [w.lower() for w in _WORD_RE.findall(text)]
        modes[mode].extend(f"{field}_{w}" for w in words)
    return Query.make(require=modes[0], contain=modes[1], exclude=modes[2], continuation=continuation, k=k)


def search_response(result: SearchResult, documents: list[str]) -> str:
    """The worker's streamed-JSON body: results are raw pre-serialized doc
    payloads spliced between brackets (main.ts:405-436); continuation is
    JSON null when exhausted (readResult maps -1 → null)."""
    cont = "null" if result.continuation is None else str(result.continuation)
    body = ",".join(documents)
    return f'{{"total":{result.total},"continuation":{cont},"results":[{body}]}}'


def no_results_response() -> str:
    """http.ts:30-31 verbatim shape."""
    return '{"results":[],"continuation":null,"total":0}'


def response_to_dict(body: str) -> dict:
    return json.loads(body)
