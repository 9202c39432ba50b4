"""Sketch kernels: pure NumPy, Spark-agnostic, mergeable monoids."""

from sketch_spark.sketches.base import Sketch, from_bytes, make_sketch, merge_all  # noqa: F401
from sketch_spark.sketches.bbmh import BBitMinHash, DivBBitMinHash  # noqa: F401
from sketch_spark.sketches.bloom import (  # noqa: F401
    BloomFilter,
    optimal_nhashes,
    optimal_params,
    size_for_hll,
)
from sketch_spark.sketches.cbf import CountingBloomStack, ProbabilisticCountingBloom  # noqa: F401
from sketch_spark.sketches.cms import CountMinSketch, CountSketch, CountSketch4W  # noqa: F401
from sketch_spark.sketches.dd import DDSketch  # noqa: F401
from sketch_spark.sketches.hll import DoubleHLL, HyperLogFilter, HyperLogLog  # noqa: F401
from sketch_spark.sketches.hk import HeavyKeeper  # noqa: F401
from sketch_spark.sketches.hmh import HyperMinHash  # noqa: F401
from sketch_spark.sketches.icws import ICWS  # noqa: F401
from sketch_spark.sketches.kll import KLL  # noqa: F401
from sketch_spark.sketches.minhash import (  # noqa: F401
    BottomKMinHash,
    CountingBottomKMinHash,
    KMinHash,
    ModSampledSet,
)
from sketch_spark.sketches.mult import SampledMultiplicity  # noqa: F401
from sketch_spark.sketches.phll import PackedHLL  # noqa: F401
from sketch_spark.sketches.pmh import PMinHash  # noqa: F401
from sketch_spark.sketches.rnla import CSVector, TensorSketch, WZVector  # noqa: F401
from sketch_spark.sketches.smh import SuperMinHash  # noqa: F401
from sketch_spark.sketches.tdigest import TDigest  # noqa: F401
from sketch_spark.sketches.vac import VACSketch  # noqa: F401
from sketch_spark.sketches.topk import MisraGries  # noqa: F401
from sketch_spark.sketches.ws import WeightedSketcher  # noqa: F401
