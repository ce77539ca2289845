"""Distributed tier: hash-partitioned CSR blocks in the Ray object
store, BSP supersteps for the iterative algorithms, Ray Data pipelines
for extraction / graph build / wide shuffles."""
