"""Relational operators (single-chip): the BASELINE.json extension surface
beyond Gandiva's expression kernels (SURVEY.md §2c). Distributed versions
live in gandiva_tpu.parallel."""
from .compaction import compact_best, compact_mask, compact_sort
from .groupby import distinct_small, group_ids, group_ids_multi
from .hash_aggregate import hash_aggregate, segment_reduce
from .hash_join import JoinResult, gather_payload, join, join_multi
from .sort import SortKey, normalize_key, sort_columns, sort_permutation
