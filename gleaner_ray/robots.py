"""robots.txt parsing and policy — per-host crawl admission state.

Re-implements what the reference gets from ``temoto/robotstxt``
(/root/reference/internal/summoner/acquire/utils.go:11-40,
resources.go:43-66,81-115): user-agent group resolution, allow/disallow
testing with Google-style wildcard rules, ``Crawl-delay`` and the
``Sitemap:`` advertisement list used by the ``robots`` source type.

This is politeness-actor init state: parsed once per host, cached in the
actor (ST3/ST4 in SURVEY §2.3), never per batch.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from urllib.parse import urlparse

__all__ = ["RobotsGroup", "RobotsData", "parse_robots"]


@dataclass
class _Rule:
    path: str
    allow: bool

    def __post_init__(self):
        # Google spec: '*' matches any chars, '$' anchors end
        self._plain = "*" not in self.path and not self.path.endswith("$")
        pat = re.escape(self.path).replace(r"\*", ".*")
        if pat.endswith(r"\$"):
            pat = pat[:-2] + "$"
        self._re = re.compile("^" + pat)

    def match(self, path: str) -> bool:
        if self._plain:  # prefix rule: C-speed startswith
            return path.startswith(self.path)
        return self._re.match(path) is not None


@dataclass
class RobotsGroup:
    agents: list[str] = field(default_factory=list)
    rules: list[_Rule] = field(default_factory=list)
    crawl_delay: float = 0.0  # seconds

    def test(self, url_or_path: str) -> bool:
        """True if fetching is allowed (robots.Test, resources.go:162)."""
        if url_or_path.startswith(("http://", "https://")):
            rest = url_or_path.split("://", 1)[1]
            slash = rest.find("/")
            path = rest[slash:] if slash >= 0 else "/"
            if "#" in path:
                path = path.split("#", 1)[0]
        else:
            path = url_or_path or "/"
        best_len = -1
        best_allow = True
        for rule in self.rules:
            if rule.path == "":
                continue  # empty Disallow == allow everything
            if rule.match(path):
                plen = len(rule.path)
                # longest match wins; allow wins ties
                if plen > best_len or (plen == best_len and rule.allow and not best_allow):
                    best_len = plen
                    best_allow = rule.allow
        return best_allow


@dataclass
class RobotsData:
    groups: list[RobotsGroup] = field(default_factory=list)
    sitemaps: list[str] = field(default_factory=list)

    def find_group(self, agent: str) -> RobotsGroup | None:
        """Longest-prefix agent match, '*' fallback (temoto semantics)."""
        agent_l = agent.lower()
        best: RobotsGroup | None = None
        best_len = -1
        star: RobotsGroup | None = None
        for g in self.groups:
            for a in g.agents:
                if a == "*":
                    if star is None:
                        star = g
                elif agent_l.startswith(a.lower()) or a.lower().startswith(agent_l.split("/")[0].lower()):
                    if len(a) > best_len:
                        best = g
                        best_len = len(a)
        return best if best is not None else star


def parse_robots(text: str) -> RobotsData:
    data = RobotsData()
    group: RobotsGroup | None = None
    last_was_agent = False
    for raw_line in text.splitlines():
        line = raw_line.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, value = line.partition(":")
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            if group is None or not last_was_agent:
                group = RobotsGroup()
                data.groups.append(group)
            group.agents.append(value)
            last_was_agent = True
            continue
        last_was_agent = False
        if key == "sitemap":
            data.sitemaps.append(value)
        elif group is not None and key in ("allow", "disallow"):
            group.rules.append(_Rule(path=value, allow=(key == "allow")))
        elif group is not None and key == "crawl-delay":
            try:
                group.crawl_delay = float(value)
            except ValueError:
                pass
    return data
