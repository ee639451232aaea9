"""Per-host politeness / admission state (ST3+ST4).

The reference serializes fetches per source with a semaphore of width
``threads`` and sleeps ``delay`` ms after each URL; any delay forces
width 1 (/root/reference/internal/summoner/acquire/acquire.go:71-73,
118-124,210). Crawl-delay can be raised by robots.txt
(resources.go:173-180).

In the Parquet-page data plane there is no live server to protect, so
admission is *logical*: each host's URLs receive a strictly increasing
``seq`` in sitemap order and a simulated admission timestamp derived
from the politeness budget (threads, delay). The pipeline uses ``seq``
for crawl-ordering parity (north rule); a live deployment would point
``admit`` at a real clock and sleep.

Sharding: one ``PolitenessShard`` actor owns ``hash(host) % n`` of the
host space, so a mega-host's admission counter lives on exactly one
actor while extraction parallelism stays unconstrained downstream.
"""

from __future__ import annotations

import math

import ray

from ..robots import parse_robots

__all__ = ["PolitenessShard", "merge_crawl_delay", "admission_ms", "wait_for_slot"]


def wait_for_slot(wall: float) -> None:
    """Sleep (in the CALLER, never in the shard actor) until the
    reserved admission instant returned by ``PolitenessShard.admit``.
    ``wall <= 0`` means no reservation (logical mode / disallowed)."""
    import time

    if wall > 0:
        d = wall - time.monotonic()
        if d > 0:
            time.sleep(d)


def admission_ms(seq: int, delay_ms: int, threads: int) -> int:
    """Simulated admission time for the seq-th URL of a host under the
    reference's politeness budget: with threads t and delay d the k-th
    URL clears admission at ceil((k+1)/t)*d; d>0 forces t=1
    (acquire.go:71-73,210). Pure — the PolitenessShard actor uses the
    same formula for live/streaming admission."""
    t = 1 if delay_ms > 0 else max(1, threads)
    return ((seq // t) + 1) * delay_ms


def merge_crawl_delay(config_delay_ms: int, robots_crawl_delay_s: float) -> int:
    """overrideCrawlDelayFromRobots (resources.go:173-180):
    delay = max(robots seconds, config override) — NB the reference
    compares seconds against ms verbatim; we keep its math.Max shape
    but in milliseconds on both sides."""
    return int(math.ceil(max(robots_crawl_delay_s * 1000.0, float(config_delay_ms))))


@ray.remote(num_cpus=0.25)
class PolitenessShard:
    """``live=False`` (default): purely logical admission (the Parquet
    data plane). ``live=True``: admission slots are RESERVED against a
    real monotonic clock — each delayed host's URLs are spaced at least
    ``delay_ms`` apart, mirroring the reference's serialize-then-sleep
    loop (acquire.go:118-124,210: semaphore of width ``threads``,
    delay>0 forces width 1, sleep(delay) after every URL). The actor
    itself NEVER sleeps: it hands back wake-at instants and the fetch
    worker sleeps until its own slot (``wait_for_slot``), so a delayed
    mega-host cannot block its shard's other hosts for the sleep
    duration. Because one host lives on exactly one shard actor and
    reservations serialize, the spacing guarantee still holds across
    every fetch worker in the cluster."""

    def __init__(self, shard_id: int, user_agent: str = "EarthCube_DataBot/1.0", live: bool = False):
        self.shard_id = shard_id
        self.user_agent = user_agent
        self.live = live
        # host -> {group, delay_ms, threads, seq, clock_ms, next_free}
        self.hosts: dict[str, dict] = {}

    def configure(self, host: str, robots_txt: str | None, delay_ms: int, threads: int) -> dict:
        group = None
        if robots_txt is not None:
            group = parse_robots(robots_txt).find_group(self.user_agent)
            if group is not None and group.crawl_delay:
                delay_ms = merge_crawl_delay(delay_ms, group.crawl_delay)
        if delay_ms > 0:
            threads = 1  # acquire.go:71-73
        self.hosts[host] = {
            "group": group,
            "delay_ms": delay_ms,
            "threads": max(1, threads),
            "seq": 0,
            "clock_ms": 0,
        }
        return {"host": host, "delay_ms": delay_ms, "threads": max(1, threads)}

    def admit(self, host: str, urls: list[str]) -> dict:
        """Admit URLs for one host in order. Returns per-url allow flags,
        seq numbers, simulated admission times (ms since host start) and,
        in live mode, the reserved wall-clock admission instants
        (monotonic s) — wake-at times the CALLER sleeps until
        (``wait_for_slot``). The call itself returns immediately in
        both modes, so other hosts hashed to this shard are admitted
        while a delayed host's slots stretch into the future."""
        import time

        state = self.hosts.get(host)
        if state is None:
            state = {"group": None, "delay_ms": 0, "threads": 1, "seq": 0, "clock_ms": 0, "next_free": 0.0}
            self.hosts[host] = state
        group = state["group"]
        allowed, seqs, times, walls = [], [], [], []
        now = time.monotonic() if self.live else 0.0
        for url in urls:
            ok = group.test(url) if group is not None else True
            allowed.append(ok)
            if ok:
                seqs.append(state["seq"])
                state["clock_ms"] = admission_ms(state["seq"], state["delay_ms"], state["threads"])
                times.append(state["clock_ms"])
                state["seq"] += 1
                if self.live:
                    slot = max(now, state.get("next_free", 0.0))
                    walls.append(slot)
                    state["next_free"] = slot + state["delay_ms"] / 1000.0
                else:
                    walls.append(-1.0)
            else:
                seqs.append(-1)
                times.append(-1)
                walls.append(-1.0)
        return {"allowed": allowed, "seq": seqs, "admit_ms": times, "admit_wall": walls}

    def host_stats(self) -> dict:
        return {h: {"seq": s["seq"], "delay_ms": s["delay_ms"]} for h, s in self.hosts.items()}
