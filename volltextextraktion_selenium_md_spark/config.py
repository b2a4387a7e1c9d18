"""Engine configuration.

Mirrors the reference's three-layer default resolution
(per-request > .env > hardcoded; reference ``app/config.py:28-76``)
as a single frozen dataclass broadcast to executors. Values that shape
crawl semantics keep the reference's defaults/limits
(``app/schemas.py:116-169``, ``app/main.py:25-91``).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class CrawlConfig:
    # BFS shape
    max_depth: int = 2            # admit children with depth <= max_depth
    max_rounds: int = 16          # hard stop; deferred/retry rows extend rounds

    # politeness (reference has a process-global semaphore of 8
    # [app/main.py:27-28]; the engine generalizes to per-host budgets)
    host_budget_per_round: int = 20
    default_crawl_delay_ms: int = 100

    # per-round TIME budget (reference TimeBudget / nav caps,
    # app/js_fetcher.py:689-712,741-742, mapped per SURVEY §4 to a
    # per-round budget column): admitted rows whose crawl-delay slot
    # falls at/after this many ms defer to the next round — the round's
    # crawl window closed before their turn. None = off.
    round_time_budget_ms: int | None = None

    # per-request timeout (reference default 30 s, schemas.py:116-128):
    # a request whose modeled latency exceeds this times out — the 504
    # path, which retries like any transport failure
    timeout_ms: int = 30_000

    # transport-level request options (reference schemas.py:105-115 /
    # http_fetcher.py:45-53): default proxy URL (normalized by the P1
    # operator before reaching the transport; per-row frontier columns
    # override when present) and the SSL-verification toggle
    proxy: str | None = None
    allow_insecure_ssl: bool = False

    # retry semantics (reference: for attempt in range(retries+1),
    # backoff min(2**attempt, 5)s [app/http_fetcher.py:64-83])
    retries: int = 1
    retryable_statuses: tuple[int, ...] = (500, 502, 503, 504)

    # payload caps (reference defaults: max_bytes 10 MiB within
    # [1 KiB, 100 MiB], app/schemas.py:156-169)
    max_bytes: int = 10 * 1024 * 1024

    # audio/video conversion policy (reference
    # media_conversion_policy, schemas.py / converter.py:253-282):
    # skip | none | metadata | full; per-row `media_policy` frontier
    # column overrides when present
    media_policy: str = "skip"

    # in-flight requests per partition in live_fetch (the reference's
    # async httpx under an 8-slot semaphore, app/main.py:27-28) —
    # network-bound crawling must not cap at 1 request per core
    fetch_concurrency: int = 8

    # modeled LLM postprocess latency: the reference's elapsed_ms spans
    # the WHOLE request including the LLM call (app/main.py:466; README
    # quotes +2-10 s when llm_postprocess is on). Deterministic per-row
    # charge = base + (page_id % (span+1)) * step on fetched rows whose
    # request asked for the LLM; it rides elapsed_ms ONLY — the
    # per-request timeout governs the TRANSPORT (httpx/Selenium timeout
    # params), so a slow LLM never 504s the request in the reference
    # and never flips outcomes here
    llm_cost_ms_base: int = 2000
    llm_cost_ms_step: int = 1000
    llm_cost_ms_span: int = 8

    # payload-size multiplier for minted bodies (1 = oracle-checked
    # test scale; scale benchmarks raise it so per-page convert cost is
    # web-realistic — real pages are tens of KB, real images hundreds
    # of KB, the reference pays SECONDS per page [README.md:223])
    payload_scale: int = 1

    # auto-mode preflight probe timeout ceiling (reference
    # app/main.py:329: probe timeout = min(timeout_s, 12)); a tripped
    # probe falls through to the BLOCKED Selenium path
    preflight_cap_ms: int = 12_000

    # strategy thresholds (reference app/preflight.py:119-124 and the
    # looser second-chance cut at app/main.py:343-349)
    http_only_text_len: int = 800
    second_chance_text_len: int = 700
    js_light_thin_text_len: int = 500

    # js_strategy 'accuracy' surcharge, ms: the reference runs two
    # Selenium pools (speed vs accuracy, app/js_fetcher.py:201-202)
    # with documented latency bands 2-6 s vs 8-12 s (README.md:362-363)
    # — midpoint ratio 4:10, so the accuracy pool adds 1.5x the base
    # JS_LIGHT charge (120 -> 300) on any request that actually renders
    js_accuracy_extra_ms: int = 180

    # speed-pool renderer cap, ms: the failure ladder's trigger. In the
    # reference a SPEED render that hits the renderer timeout — or
    # exhausts its retries, which a bot wall always does — escalates
    # ONCE to a fresh accuracy-pool driver (app/js_fetcher.py:896-946
    # early path, :933-946 exhaustion path). The deterministic twin: a
    # speed-pool Selenium render whose modeled latency exceeds this cap
    # (or whose strategy is BLOCKED) pays the one-shot accuracy
    # surcharge and records js_escalated. 160 sits between the plain
    # JS_LIGHT render (120/150) and the double-fetch second-chance miss
    # (60+120=180), mirroring the reference where only the slow tail of
    # speed renders trips the ladder.
    js_renderer_cap_ms: int = 160

    # fetch-stage cost model, ms/page — midpoints of the reference's
    # documented latency ranges (README.md:223,362,363; BASELINE.md)
    cost_ms: dict[str, int] = field(default_factory=lambda: {
        "HTTP_ONLY": 30,
        "HTTP_THEN_JS": 60,
        "JS_LIGHT": 120,
        "JS_LIGHT_CONSENT": 150,
        "PDF": 40,
        "RSS": 20,
        "YOUTUBE": 25,
        "BLOCKED": 10,
    })


DEFAULT_CONFIG = CrawlConfig()
