"""Canonical portable 60-bit hash device — the ONE definition.

``_SPARK_H`` / ``_DUCK_H`` are format templates over an SQL expression
``{expr}``: md5 → first 15 hex chars (60 bits, always < 2^63 so the
int64 cast can never overflow or go negative) → int64. The same value on
any engine that agrees on md5 and hex parsing; used by every
deterministic-sampling, dedup-shingling and bucketing operator, and
pinned cross-engine by ``parity_probe_hexcast``.

Every consumer (operators.dedup, operators.pipeline, operators.parity,
operators.textstats) imports from here — per the r8 advice, the parity
probes must exercise the EXACT expression the operators use, so a future
change to the device propagates to the probes by construction instead of
silently certifying a stale formula.
"""

from __future__ import annotations

_SPARK_H = "cast(conv(substr(md5({expr}), 1, 15), 16, 10) as bigint)"
_DUCK_H = "CAST(concat('0x', substr(md5({expr}), 1, 15)) AS BIGINT)"

# Token-level instantiation (expr = a column named ``t``), shared by the
# textstats fingerprint/DSIR paths.
_SPARK_TH = _SPARK_H.format(expr="t")
_DUCK_TH = _DUCK_H.format(expr="t")
