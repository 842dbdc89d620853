"""Registry of training-data-pipeline + streaming queries, merged into
the driver-contract QUERIES dict by plans/testdata_queries.py.

Each module contributes ``{name: (spark_fn, oracle_sql | None)}``;
``None`` marks approximate/rows-only ops (ANN variants) where the
driver records a weaker rows-only check.
"""

from __future__ import annotations

from ..streaming.queries import QUERIES_EXPORT as STREAMING_QUERIES
from .batching import QUERIES_EXPORT as BATCHING_QUERIES
from .bpe import QUERIES_EXPORT as BPE_QUERIES
from .budget import QUERIES_EXPORT as BUDGET_QUERIES
from .dedup import QUERIES_EXPORT as DEDUP_QUERIES
from .histograms import QUERIES_EXPORT as HISTOGRAM_QUERIES
from .multimodal import QUERIES_EXPORT as MULTIMODAL_QUERIES
from .paragraphs import QUERIES_EXPORT as PARAGRAPH_QUERIES
from .png_codec import QUERIES_EXPORT as PNG_QUERIES
from .pruning import QUERIES_EXPORT as PRUNING_QUERIES
from .checksum import QUERIES_EXPORT as CHECKSUM_QUERIES
from .cluster_ops import QUERIES_EXPORT as CLUSTER_OPS_QUERIES
from .currpack import QUERIES_EXPORT as CURRPACK_QUERIES
from .curriculum import QUERIES_EXPORT as CURRICULUM_QUERIES
from .corpus_diff import QUERIES_EXPORT as CORPUS_DIFF_QUERIES
from .dataset_cards import QUERIES_EXPORT as DATASET_CARD_QUERIES
from .funnel import QUERIES_EXPORT as FUNNEL_QUERIES
from .quality_calibration import QUERIES_EXPORT as QUALITY_CAL_QUERIES
from .release import QUERIES_EXPORT as RELEASE_QUERIES
from .kmeans import QUERIES_EXPORT as KMEANS_QUERIES
from .sampling import QUERIES_EXPORT as SAMPLING_QUERIES
from .search import SEARCH_QUERIES
from .sharding import QUERIES_EXPORT as SHARDING_QUERIES
from .similarity import QUERIES_EXPORT as SIMILARITY_QUERIES
from .sketches import SKETCH_QUERIES
from .source_stats import QUERIES_EXPORT as SOURCE_STATS_QUERIES
from .textstats import TEXT_QUERIES
from .traindata import TRAINDATA_QUERIES

FUNCTION_QUERIES = {
    **TEXT_QUERIES,
    **TRAINDATA_QUERIES,
    **DEDUP_QUERIES,
    **SIMILARITY_QUERIES,
    **MULTIMODAL_QUERIES,
    **PARAGRAPH_QUERIES,
    **PNG_QUERIES,
    **PRUNING_QUERIES,
    **CURRICULUM_QUERIES,
    **CURRPACK_QUERIES,
    **BPE_QUERIES,
    **RELEASE_QUERIES,
    **SAMPLING_QUERIES,
    **CHECKSUM_QUERIES,
    **CLUSTER_OPS_QUERIES,
    **CORPUS_DIFF_QUERIES,
    **DATASET_CARD_QUERIES,
    **FUNNEL_QUERIES,
    **QUALITY_CAL_QUERIES,
    **KMEANS_QUERIES,
    **STREAMING_QUERIES,
    **SKETCH_QUERIES,
    **SEARCH_QUERIES,
    **SOURCE_STATS_QUERIES,
    **BATCHING_QUERIES,
    **BUDGET_QUERIES,
    **HISTOGRAM_QUERIES,
    **SHARDING_QUERIES,
}
