"""Kafka default-partitioner math (plan-time partition pruning).

The reference recomputes the producer's default partition for a literal
key to scan only that partition (kbrowse `src/kbrowse/kafka.clj:59-70`,
used at `search.clj:143-145`).  That is murmur2 (Kafka's 32-bit
variant, from the public Apache Kafka `Utils.murmur2`) masked positive,
mod the topic's partition count.

This runs driver-side at plan-build — the result feeds the Kafka source
``assign`` option JSON, so the executor never reads the pruned
partitions at all.  Golden test: key ``k2`` on a 10-partition topic ->
partition 3 (reference `run-integration-tests:145-150`).
"""

from __future__ import annotations

_SEED = 0x9747B28C
_M = 0x5BD1E995
_R = 24
_MASK = 0xFFFFFFFF


def murmur2(data: bytes) -> int:
    """Kafka's murmur2 (unsigned 32-bit result)."""
    length = len(data)
    h = (_SEED ^ length) & _MASK
    i = 0
    while length - i >= 4:
        k = data[i] | (data[i + 1] << 8) | (data[i + 2] << 16) | (data[i + 3] << 24)
        k = (k * _M) & _MASK
        k ^= k >> _R
        k = (k * _M) & _MASK
        h = (h * _M) & _MASK
        h ^= k
        i += 4
    rem = length - i
    if rem == 3:
        h ^= data[i + 2] << 16
    if rem >= 2:
        h ^= data[i + 1] << 8
    if rem >= 1:
        h ^= data[i]
        h = (h * _M) & _MASK
    h ^= h >> 13
    h = (h * _M) & _MASK
    h ^= h >> 15
    return h


def default_partition(key: bytes | str, num_partitions: int) -> int:
    """Partition the Kafka DefaultPartitioner would pick for ``key``."""
    if isinstance(key, str):
        key = key.encode("utf-8")
    if num_partitions <= 0:
        raise ValueError("num_partitions must be positive")
    return (murmur2(key) & 0x7FFFFFFF) % num_partitions
