"""Bounded retry/backoff + proxy rotation for HTTP fetch paths.

Re-expresses the reference's request executor
(``app/service/request_executor.ts:108-158``):

- per-request retries: ``maxAttempts`` attempts with ``retryDelay``
  between them (requestretry's fixed-delay strategy; a backoff factor is
  supported on top since transient CDN failures usually deserve one);
- a pluggable ``retry_on`` predicate (the ``retryStrategy`` hook);
- proxy rotation: a pool handing out proxies round-robin, with poisoned
  proxies dropped and the request re-issued on a fresh one
  (``needRefreshProxy`` + ``getRequestInstance``);
- worker-level drain-and-retry: after a whole queue drains, failed items
  are re-attempted up to ``workerRetry`` more passes separated by
  ``workerRetryInterval`` (the while-loop around ``work()``).

Everything time-related is injectable (``sleep``) so tests run instantly;
permanent failures return falsy rather than raising, matching the
reference's resolve([false, undefined]) so callers demote cleanly.
"""

from __future__ import annotations

import time
from collections.abc import Callable
from dataclasses import dataclass, field
from typing import Any


@dataclass
class RetryPolicy:
    """Per-request retry knobs (retryOption, request_executor.ts:23-28)."""

    max_attempts: int = 3  # maxRetryTime
    delay_s: float = 2.0  # retryDelayTime
    backoff: float = 1.0  # 1.0 = requestretry's fixed delay
    max_delay_s: float = 60.0
    sleep: Callable[[float], None] = field(default=time.sleep, repr=False)

    def delays(self) -> list[float]:
        """The sleep before each retry (len == max_attempts - 1)."""
        out, d = [], self.delay_s
        for _ in range(max(0, self.max_attempts - 1)):
            out.append(min(d, self.max_delay_s))
            d *= self.backoff
        return out


class ProxyPool:
    """Round-robin proxy rotation with poisoned-proxy eviction
    (proxyOption, request_executor.ts:30-34,114-119)."""

    def __init__(self, proxies: list[str]):
        from collections import deque

        self._proxies = deque(proxies)

    def get(self) -> str | None:
        if not self._proxies:
            return None
        p = self._proxies.popleft()
        self._proxies.append(p)  # rotate to the back
        return p

    def mark_bad(self, proxy: str) -> None:
        """needRefreshProxy: drop the poisoned proxy from rotation (the
        next attempt gets a fresh one). An empty pool degrades to direct."""
        try:
            self._proxies.remove(proxy)
        except ValueError:
            pass

    def __len__(self) -> int:
        return len(self._proxies)


def call_with_retries(
    fn: Callable[[], Any],
    policy: RetryPolicy,
    retry_on: Callable[[BaseException | None, Any], bool] | None = None,
) -> Any:
    """Run ``fn`` up to ``policy.max_attempts`` times; falsy results and
    exceptions count as failures. ``retry_on(exc, result)`` can veto a
    retry (the retryStrategy hook) — when it returns False the current
    falsy result (or False for an exception) is returned immediately.
    Permanent failure returns the last falsy result, never raises."""
    delays = policy.delays()
    result: Any = False
    for attempt in range(policy.max_attempts):
        exc: BaseException | None = None
        try:
            result = fn()
            if result:
                return result
        except Exception as e:  # singleRequest resolves, never rejects
            exc = e
            result = False
        if retry_on is not None and not retry_on(exc, result):
            return result
        if attempt < len(delays):
            policy.sleep(delays[attempt])
    return result


def retrying_fetcher(
    base_fetcher: Callable[..., Any],
    policy: RetryPolicy,
    proxy_pool: ProxyPool | None = None,
    retry_on: Callable[[BaseException | None, Any], bool] | None = None,
) -> Callable[..., Any]:
    """Wrap a fetcher callable with per-request retries (+ optional proxy
    rotation). Without a pool the wrapped fetcher is called with the
    original arguments; with one, a ``proxy=`` kwarg is added and the
    attempt's proxy is evicted on failure before the next attempt."""

    def fetch(*args: Any, **kwargs: Any) -> Any:
        if proxy_pool is None:
            return call_with_retries(lambda: base_fetcher(*args, **kwargs), policy, retry_on)

        def attempt() -> Any:
            proxy = proxy_pool.get()
            try:
                out = base_fetcher(*args, proxy=proxy, **kwargs)
            except Exception:
                if proxy is not None:
                    proxy_pool.mark_bad(proxy)
                raise
            if not out and proxy is not None:
                proxy_pool.mark_bad(proxy)
            return out

        return call_with_retries(attempt, policy, retry_on)

    return fetch
