"""Crawl configuration: the same YAML surface as the reference.

Mirrors the reference's config layer:

- ``Source`` struct and defaults     -> /root/reference/internal/config/sources.go:52-117
- summoner subtree and defaults      -> internal/config/summoner.go:10-44
- minio subtree / bucket helper      -> internal/config/minio.go:22-57
- top-level defaults + YAML read     -> internal/config/gleanerConfig.go:10-49
- context options enum               -> internal/config/sources.go:18-49

Only the ``sitemap`` and ``robots`` source types are implemented, as in
the reference fork (``resources.go:40,81`` are the only consumers).
Config is driver-side state: plain dataclasses, no Dataset involved.
"""

from __future__ import annotations

from dataclasses import dataclass, field, asdict
from enum import Enum
from typing import Any

try:
    import yaml
except ImportError:  # pragma: no cover
    yaml = None

__all__ = [
    "ContextOption",
    "Source",
    "SummonerConfig",
    "MinioConfig",
    "ContextConfig",
    "GleanerConfig",
    "IDENTIFIER_SHA",
    "JSON_SHA",
    "NORMALIZED_JSON_SHA",
    "IDENTIFIER_STRING",
    "SOURCE_URL",
]

# identifier types (sources.go:10-16)
IDENTIFIER_SHA = "identifiersha"
JSON_SHA = "jsonsha"
NORMALIZED_JSON_SHA = "normalizedjsonsha"
IDENTIFIER_STRING = "identifierstring"
SOURCE_URL = "sourceurl"

USER_AGENT = "EarthCube_DataBot/1.0"  # acquire.go:20
JSON_CONTENT_TYPE = "application/ld+json"  # acquire.go:21
DEFAULT_ACCEPT = "application/ld+json, text/html"  # sources.go:29


class ContextOption(Enum):
    """FixContextOption (sources.go:18-49)."""

    STRICT = "strict"
    HTTPS = "https"
    HTTP = "http"
    STANDARDIZED_HTTPS = "standardizedHttps"
    STANDARDIZED_HTTP = "standardizedHttp"

    @classmethod
    def parse(cls, s: str | None) -> "ContextOption":
        if not s:
            return cls.HTTPS  # template default (sources.go:113)
        for opt in cls:
            if opt.value.lower() == str(s).lower():
                return opt
        return cls.HTTPS


@dataclass
class Source:
    """One crawl source (sources.go:52-76, defaults sources.go:98-117)."""

    sourcetype: str = "sitemap"
    name: str = ""
    logo: str = ""
    url: str = ""
    headless: bool = False
    pid: str = ""
    propername: str = ""
    domain: str = ""
    active: bool = True
    credentialsfile: str = ""
    headlesswait: int = 0
    delay: int = 0  # ms
    identifierpath: str = ""
    apipagelimit: int = 0
    identifiertype: str = JSON_SHA
    fixcontextoption: ContextOption = ContextOption.HTTPS
    acceptcontenttype: str = DEFAULT_ACCEPT
    jsonprofile: str = ""

    def __post_init__(self):
        if isinstance(self.fixcontextoption, str):
            self.fixcontextoption = ContextOption.parse(self.fixcontextoption)
        if not self.acceptcontenttype:
            self.acceptcontenttype = DEFAULT_ACCEPT

    @classmethod
    def from_dict(cls, d: dict) -> "Source":
        known = {f for f in cls.__dataclass_fields__}
        return cls(**{str(k).lower(): v for k, v in d.items() if str(k).lower() in known})

    def to_row(self) -> dict:
        row = asdict(self)
        row["fixcontextoption"] = self.fixcontextoption.value
        return row


@dataclass
class SummonerConfig:
    """summoner: subtree (summoner.go:10-28); template defaults applied."""

    after: str = ""
    mode: str = "full"
    threads: int = 5
    delay: int = 0  # template default is 10000 but tests/configs set it; ms
    headless: str = "http://127.0.0.1:9222"
    identifiertype: str = JSON_SHA

    def validate(self) -> None:
        # summoner.go:40-42
        if self.headless.endswith("/"):
            raise ValueError("headless should not end with / %s" % self.headless)
        if self.mode == "diff":
            # resources.go:73-75 — declared but unimplemented in the reference
            raise NotImplementedError("Mode diff is not currently supported")


@dataclass
class MinioConfig:
    """minio: subtree (minio.go:22-32). Local-fs object roots are allowed."""

    address: str = "localhost"
    port: int = 9000
    ssl: bool = False
    accesskey: str = ""
    secretkey: str = ""
    bucket: str = "gleaner"
    region: str = ""

    def bucket_name(self) -> str:
        return self.bucket


@dataclass
class ContextConfig:
    """context: + contextmaps: subtrees (gleanerConfig.go:13-24, ldproc.go:17-21)."""

    cache: bool = True
    strict: bool = False
    contextmaps: dict[str, str] = field(default_factory=dict)  # prefix -> local file


@dataclass
class GleanerConfig:
    minio: MinioConfig = field(default_factory=MinioConfig)
    summoner: SummonerConfig = field(default_factory=SummonerConfig)
    context: ContextConfig = field(default_factory=ContextConfig)
    sources: list[Source] = field(default_factory=list)
    rude: bool = False
    summon: bool = True
    mill: bool = False

    # -- filters (sources.go:135-172) -------------------------------------
    def sources_by_type(self, key: str) -> list[Source]:
        return [s for s in self.sources if s.sourcetype == key]

    def filter_sources_by_type(self, key: str) -> list[Source]:
        return [s for s in self.sources if s.sourcetype == key and s.active]

    def filter_sources_by_headless(self, headless: bool) -> list[Source]:
        return [s for s in self.sources if s.headless == headless and s.active]

    def source_by_name(self, name: str) -> Source:
        for s in self.sources:
            if s.name == name:
                return s
        raise KeyError("unable to find a source with name %s" % name)

    def narrow_to_source(self, name: str) -> None:
        """--source flag: keep one source, force active (root.go:80-110)."""
        src = self.source_by_name(name)
        src.active = True
        self.sources = [src]

    # -- retrieval config (acquire.go:55-106) ------------------------------
    def retrieval_config(self, source_name: str) -> dict:
        tc = self.summoner.threads
        delay = self.summoner.delay
        if delay != 0 or tc == 0:
            tc = 1
        src = self.source_by_name(source_name)
        accept = src.acceptcontenttype or JSON_CONTENT_TYPE
        if src.delay != 0 and src.delay > delay:
            delay = src.delay
            tc = 1
        return {
            "bucket": self.minio.bucket_name(),
            "threads": tc,
            "delay_ms": delay,
            "headless_wait": src.headlesswait,
            "accept": accept,
            "json_profile": src.jsonprofile,
        }

    @classmethod
    def from_yaml(cls, path_or_text: str) -> "GleanerConfig":
        if yaml is None:  # pragma: no cover
            raise RuntimeError("pyyaml unavailable")
        if "\n" in path_or_text or ":" not in path_or_text.split("\n", 1)[0]:
            try:
                with open(path_or_text) as f:
                    data = yaml.safe_load(f)
            except (OSError, ValueError):
                data = yaml.safe_load(path_or_text)
        else:
            data = yaml.safe_load(path_or_text)
        return cls.from_dict(data or {})

    @classmethod
    def from_dict(cls, data: dict[str, Any]) -> "GleanerConfig":
        data = {str(k).lower(): v for k, v in data.items()}
        mc = MinioConfig(**{k: v for k, v in (data.get("minio") or {}).items() if k in MinioConfig.__dataclass_fields__})
        sc_raw = {str(k).lower(): v for k, v in (data.get("summoner") or {}).items()}
        sc = SummonerConfig(**{k: v for k, v in sc_raw.items() if k in SummonerConfig.__dataclass_fields__})
        ctx_raw = data.get("context") or {}
        cmaps = {}
        for m in data.get("contextmaps") or []:
            if isinstance(m, dict) and "prefix" in m and "file" in m:
                cmaps[m["prefix"]] = m["file"]
        cc = ContextConfig(
            cache=str(ctx_raw.get("cache", "true")).lower() == "true",
            strict=str(ctx_raw.get("strict", "false")).lower() == "true",
            contextmaps=cmaps,
        )
        sources = [Source.from_dict(s) for s in data.get("sources") or []]
        g = data.get("gleaner") or {}
        return cls(
            minio=mc,
            summoner=sc,
            context=cc,
            sources=sources,
            rude=bool(data.get("rude", False)),
            summon=str(g.get("summon", "true")).lower() == "true",
            mill=str(g.get("mill", "false")).lower() == "true",
        )
