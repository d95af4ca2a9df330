"""API-usage / limits accounting -- connector observability.

Reference parity (/root/reference/libs/simple-salesforce/simple_salesforce/
api.py):
  - ``Salesforce.limits()``     (api.py:330-340)  org-limits snapshot
  - ``Salesforce.api_usage``    updated after every call from the
    ``Sforce-Limit-Info`` response header
  - ``Util.parse_api_usage``    (api.py:472-500)  parses
    ``api-usage=18/5000`` and
    ``per-app-api-usage=17/250(appName=sample-connected-app)``

The engine has no metered REST endpoint, but the OPERATIONAL question the
reference answers -- "how much of my extract budget has this sync burned,
per entity, and am I about to hit the ceiling?" -- applies unchanged to a
Spark connector reading a rate-limited source (or a cloud store with
request quotas). The twin:

  - ``parse_api_usage`` / ``format_limit_info``: the reference's header
    dialect, parsed and rendered (round-trip tested) so state can be
    exchanged with tooling that speaks it. Parsing is split-based, not a
    port of the reference's regexes.
  - ``UsageTracker``: per-(entity, op) request/row counters with an
    optional total-request quota; ``EntitySource`` records into it when
    constructed with one, mirroring how every ``_call_salesforce`` updates
    ``api_usage``.  The counters are DRIVER-side bookkeeping of logical
    requests (scan operations), deliberately not Spark metrics: the
    reference's number is "API calls", and the twin's is "source scans".

At 100 TB nothing here touches the data plane -- O(entities x ops) dict
entries on the driver.
"""

from __future__ import annotations

from collections import namedtuple

Usage = namedtuple("Usage", ["used", "total"])
PerAppUsage = namedtuple("PerAppUsage", ["used", "total", "name"])


class UsageLimitExceeded(RuntimeError):
    """Raised by an ENFORCING tracker when a request would exceed the quota
    (the server-side 403 REQUEST_LIMIT_EXCEEDED, surfaced client-side)."""


def _parse_frac(text: str) -> tuple[int, int]:
    used, total = text.split("/", 1)
    return int(used), int(total)


def parse_api_usage(sforce_limit_info: str) -> dict:
    """Parse the ``Sforce-Limit-Info`` header dialect (api.py:472-500).

    Accepts the same two shapes the reference documents:
      ``api-usage=18/5000``
      ``api-usage=25/5000; per-app-api-usage=17/250(appName=sample-app)``
    Unknown AND malformed clauses are ignored, like the reference's
    targeted regexes: ``api-usage=18`` or ``api-usage=18/abc`` simply
    don't match there, so they must not raise here either (ADVICE r9).
    """
    result: dict = {}
    for clause in sforce_limit_info.split(";"):
        clause = clause.strip()
        if not clause or "=" not in clause:
            continue
        key, _, val = clause.partition("=")
        key = key.strip()
        try:
            if key == "api-usage":
                result["api-usage"] = Usage(*_parse_frac(val.strip()))
            elif key == "per-app-api-usage":
                frac, _, app = val.partition("(")
                name = ""
                if app.endswith(")"):
                    inner = app[:-1]
                    if inner.startswith("appName="):
                        name = inner[len("appName=") :]
                result["per-app-api-usage"] = PerAppUsage(
                    *_parse_frac(frac.strip()), name
                )
        except ValueError:
            continue  # non-matching fraction: skip the clause, keep the rest
    return result


def format_limit_info(usage: Usage, per_app: PerAppUsage | None = None) -> str:
    """Render the header dialect (inverse of ``parse_api_usage``)."""
    out = f"api-usage={usage.used}/{usage.total}"
    if per_app is not None:
        out += (
            f"; per-app-api-usage={per_app.used}/{per_app.total}"
            f"(appName={per_app.name})"
        )
    return out


class UsageTracker:
    """Per-(entity, op) request/row accounting with an optional quota.

    ``quota``: total logical requests allowed (None = unmetered, count
    only). ``enforce``: raise ``UsageLimitExceeded`` when a request would
    pass the quota; False mirrors the reference (report, never block).
    """

    def __init__(self, quota: int | None = None, enforce: bool = False, app: str = ""):
        self.quota = quota
        self.enforce = enforce
        self.app = app
        self._requests: dict[tuple[str, str], int] = {}
        self._rows: dict[tuple[str, str], int] = {}

    def record(self, entity: str, op: str, rows: int = 0) -> Usage:
        if self.enforce and self.quota is not None and self.used + 1 > self.quota:
            raise UsageLimitExceeded(
                f"request quota exhausted ({self.used}/{self.quota}) at "
                f"{entity}.{op}"
            )
        key = (entity, op)
        self._requests[key] = self._requests.get(key, 0) + 1
        self._rows[key] = self._rows.get(key, 0) + rows
        return self.api_usage

    @property
    def used(self) -> int:
        return sum(self._requests.values())

    @property
    def api_usage(self) -> Usage:
        """The reference's post-call ``sf.api_usage`` shape (total is None
        for an unmetered tracker -- there is no numeric sentinel that could
        be mistaken for a real quota)."""
        return Usage(self.used, self.quota)

    def remaining(self) -> int | None:
        return None if self.quota is None else max(0, self.quota - self.used)

    def header(self) -> str:
        """Round-trippable ``Sforce-Limit-Info``-dialect rendering.

        Requires a quota: the dialect has no unmetered form, and rendering
        ``N/0`` would read to any consumer as an exhausted zero quota."""
        if self.quota is None:
            raise ValueError(
                "unmetered tracker (quota=None) has no limit header; "
                "construct with a quota to render one"
            )
        usage = Usage(self.used, self.quota)
        per_app = (
            PerAppUsage(usage.used, usage.total, self.app) if self.app else None
        )
        return format_limit_info(usage, per_app)

    def limits(self) -> dict:
        """Org-limits-style snapshot (api.py:330-340): overall remaining
        plus the per-entity, per-op breakdown."""
        by_entity: dict = {}
        for (entity, op), n in sorted(self._requests.items()):
            by_entity.setdefault(entity, {})[op] = {
                "requests": n,
                "rows": self._rows[(entity, op)],
            }
        return {
            "Requests": {
                "Max": self.quota,
                "Used": self.used,
                "Remaining": self.remaining(),
            },
            "ByEntity": by_entity,
        }
