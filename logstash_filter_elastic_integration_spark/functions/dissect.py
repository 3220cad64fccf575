"""Dissect pattern compiler.

Re-implements the ES ``dissect`` ingest processor (reference contract:
/root/reference/spec/integration/elastic_integration_spec.rb:303-333):
positional ``%{key}`` splitting on literal delimiters — no regex authored by
the user.  We compile the dissect pattern ONCE on the driver into a single
anchored regex whose captures are the keys and whose literal delimiters are
escaped, so simple dissects lower to pure JVM-side
``F.regexp_extract`` columns (no Python at all); patterns using append
(``%{+key}``) or named-skip modifiers fall back to the same regex inside the
vectorized grok pandas-UDF path.

Supported modifiers (the set exercised by the reference's fixtures):
  %{}        skip (matched, not captured)
  %{?name}   named skip
  %{+name}   append to previous capture of name (joined with append_separator)
  %{name->}  right-padding trim
  %{*name} / %{&name}  reference keys: the FIELD NAME comes from the data
             (*) and its value from the paired capture (&) — per-row
             dynamic names land in the ``_extras`` map side-channel
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

_KEY = re.compile(r"%\{([^}]*)\}")


@dataclass
class CompiledDissect:
    regex: str                      # full anchored pattern, mangled groups
    group_map: dict[str, str] = field(default_factory=dict)  # gN -> field
    appends: dict[str, list[str]] = field(default_factory=dict)  # field -> [gN,...]
    ref_keys: dict[str, str] = field(default_factory=dict)   # name -> gN (*)
    ref_vals: dict[str, str] = field(default_factory=dict)   # name -> gN (&)
    append_separator: str = ""

    @property
    def fields(self) -> list[str]:
        seen: list[str] = []
        for f in list(self.group_map.values()) + list(self.appends):
            if f not in seen:
                seen.append(f)
        return seen

    @property
    def is_simple(self) -> bool:
        """True when every field is a single plain capture -> can lower to
        JVM-side regexp_extract with no Python involvement."""
        return not self.appends


def compile_dissect(pattern: str, append_separator: str = "") -> CompiledDissect:
    out = CompiledDissect(regex="", append_separator=append_separator)
    parts: list[str] = []
    pos = 0
    keys = list(_KEY.finditer(pattern))
    for i, m in enumerate(keys):
        lit = pattern[pos:m.start()]
        parts.append(re.escape(lit))
        key = m.group(1)
        pos = m.end()
        pad = key.endswith("->")
        if pad:
            key = key[:-2]
        last = i == len(keys) - 1 and pos >= len(pattern)
        body = "(?s:.*)" if last else "(?s:.*?)"
        def next_g():
            return "g" + str(len(out.group_map)
                             + sum(len(v) for v in out.appends.values())
                             + len(out.ref_keys) + len(out.ref_vals))

        if key == "" or key.startswith("?"):
            parts.append(body)
        elif key.startswith("+"):
            fname = key[1:]
            g = next_g()
            out.appends.setdefault(fname, []).append(g)
            parts.append(f"(?P<{g}>{body})")
        elif key.startswith("*"):
            g = next_g()
            out.ref_keys[key[1:]] = g
            parts.append(f"(?P<{g}>{body})")
        elif key.startswith("&"):
            g = next_g()
            out.ref_vals[key[1:]] = g
            parts.append(f"(?P<{g}>{body})")
        else:
            g = next_g()
            out.group_map[g] = key
            parts.append(f"(?P<{g}>{body})")
        if pad:
            parts.append(" *")
    parts.append(re.escape(pattern[pos:]))
    if set(out.ref_keys) != set(out.ref_vals):
        raise ValueError(
            "dissect: every %{*name} reference key needs a matching "
            f"%{{&name}} value (keys={sorted(out.ref_keys)}, "
            f"values={sorted(out.ref_vals)})")
    out.regex = "^" + "".join(parts) + "$"
    re.compile(out.regex)  # validate at compile time
    return out
