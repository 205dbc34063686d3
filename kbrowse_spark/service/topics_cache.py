"""Topic-metadata cache (kbrowse O19 parity, `src/kbrowse/topics.clj`).

A background thread refreshes bootstrap-servers -> topic-set on a fixed
period (reference default 300 s) so the console's topic dropdown never
blocks on a broker round-trip.  The lister is injectable: the real one
wraps a Kafka AdminClient (import-gated — the client library is absent
in this environment); tests inject a fake.
"""

from __future__ import annotations

import threading
from collections.abc import Callable


def admin_client_lister(bootstrap_servers: str) -> set[str]:  # pragma: no cover
    """Default lister via kafka-python's AdminClient (if installed)."""
    from kafka import KafkaConsumer  # type: ignore

    consumer = KafkaConsumer(bootstrap_servers=bootstrap_servers)
    try:
        return set(consumer.topics())
    finally:
        consumer.close()


class TopicMetadataCache:
    def __init__(
        self,
        clusters: list[str],
        refresh_seconds: int = 300,
        lister: Callable[[str], set[str]] | None = None,
    ):
        self.clusters = list(clusters)
        self.refresh_seconds = refresh_seconds
        self.lister = lister or admin_client_lister
        self._topics: dict[str, set[str]] = {}
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    def refresh(self) -> None:
        for cluster in self.clusters:
            try:
                topics = self.lister(cluster)
            except Exception:  # broker down: keep the stale snapshot
                continue
            with self._lock:
                self._topics[cluster] = set(topics)

    def topics(self, cluster: str) -> set[str]:
        with self._lock:
            return set(self._topics.get(cluster, ()))

    def start(self) -> None:
        if self._thread is not None:
            return
        self.refresh()

        def loop() -> None:
            while not self._stop.wait(self.refresh_seconds):
                self.refresh()

        self._thread = threading.Thread(target=loop, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5)
            self._thread = None
