"""Isolation Forest as a pure-Python ``pyspark.ml`` Estimator/Model.

Capability-parity rebuild of the reference Scala implementation
(/root/reference/src/main/scala/org/apache/spark/ml/iforest/IForest.scala)
with an idiomatic-Spark execution plan:

* training: deterministic hash-based candidate-pool sampling → broadcast
  semi-join of the driver's per-tree assignment table → one shuffle keyed by
  treeId → ``applyInPandas`` builds each tree in a task (model-wise
  parallelism, same as reference IForest.scala:324-330) → collect NodeData
* scoring: one Arrow-vectorized ``pandas_udf`` (numpy level-synchronous
  descent) — replaces the reference's per-row boxed-Vector UDF, its
  published bottleneck
* threshold: ``DataFrame.approxQuantile`` (identical built-in the reference
  calls, IForest.scala:101-105)
* prediction: pure Catalyst ``when()`` expression — stays in whole-stage
  codegen, no Python (reference uses a UDF, IForest.scala:107-111)

Scale notes (100 TB / 1000 executors): when maxSamples is an absolute count
(the practical setting, e.g. 256), the candidate pool is O(numTrees *
maxSamples) rows regardless of input size — one Bernoulli-filtered scan
(filter pushed to the parquet reader's output), one tiny sort, one shuffle
of ~numTrees*maxSamples rows. Scoring is embarrassingly data-parallel with
the forest broadcast once per executor. With maxSamples <= 1 (a *fraction*
of the input) the reference semantics require numTrees*fraction*n rows to
converge on numTrees tasks — inherently unscalable for large fractions; we
preserve the semantics and document the cliff.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.ml import Estimator, Model
from pyspark.ml.param import Params
from pyspark.ml.util import (
    DefaultParamsReadable,
    DefaultParamsReader,
    DefaultParamsWritable,
    DefaultParamsWriter,
    MLReadable,
    MLReader,
    MLWritable,
    MLWriter,
)
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import ArrayType, DoubleType, NumericType
from pyspark.sql.window import Window

from spark_iforest_spark.checkpoint import snapshot
from spark_iforest_spark.nodes import (
    FLAT_NODE_SCHEMA,
    PackedForest,
    Tree,
    pack_forest,
    pandas_to_forest,
    rows_to_forest,
    tree_to_rows,
)
from spark_iforest_spark.params import IForestParams
from spark_iforest_spark.scorer import avg_length, make_score_udf
from spark_iforest_spark.trainer import train_tree

_POOL_OVERSAMPLE = 1.1
_POOL_SLACK = 1024
# above this pool size, rid assignment switches from one global sort to
# partition-local row numbers + driver offsets (distributed zipWithIndex)
_POOL_GLOBAL_SORT_MAX = 20_000_000


def _features_as_array(df: DataFrame, features_col: str) -> F.Column:
    """Normalize the features column to array<double>.

    Accepts ml VectorUDT (reference's only input type, IForest.scala:845-847)
    or array<numeric> (our native representation — Arrow-friendly,
    SURVEY.md §7 risk list)."""
    dtype = df.schema[features_col].dataType
    if isinstance(dtype, ArrayType):
        return F.col(features_col).cast("array<double>")
    # VectorUDT
    from pyspark.ml.functions import vector_to_array

    return vector_to_array(F.col(features_col)).cast("array<double>")


def _validate_features_schema(df: DataFrame, features_col: str) -> None:
    if features_col not in df.columns:
        raise ValueError(f"features column '{features_col}' not found in {df.columns}")
    dtype = df.schema[features_col].dataType
    if isinstance(dtype, ArrayType) and isinstance(dtype.elementType, NumericType):
        return
    if type(dtype).__name__ == "VectorUDT":
        return
    raise TypeError(
        f"features column '{features_col}' must be VectorUDT or array<numeric>, got {dtype}"
    )


class IForest(Estimator, IForestParams, DefaultParamsWritable, DefaultParamsReadable):
    """Isolation Forest estimator (reference: IForest.scala:317-670)."""

    def __init__(self, **kwargs):
        super().__init__()
        self._set_default_params()
        bad = set(kwargs) - {p.name for p in self.params}
        if bad:
            raise TypeError(f"unknown params: {sorted(bad)}")
        self._set(**kwargs)
        self._validate_params()

    # ---- setters (validate eagerly, like the reference's ParamValidators) --
    def _checked_set(self, **kwargs) -> "IForest":
        self._set(**kwargs)
        self._validate_params()
        return self

    def setParams(self, **kwargs) -> "IForest":
        """Bulk re-set, the reference wrapper's surface
        (pyspark_iforest/ml/iforest.py:256-264): accepts the same keyword
        set as the constructor, validates, returns self."""
        bad = set(kwargs) - {p.name for p in self.params}
        if bad:
            raise TypeError(f"unknown params: {sorted(bad)}")
        return self._checked_set(**kwargs)

    def setNumTrees(self, value: int) -> "IForest":
        return self._checked_set(numTrees=value)

    def setMaxSamples(self, value: float) -> "IForest":
        return self._checked_set(maxSamples=value)

    def setMaxFeatures(self, value: float) -> "IForest":
        return self._checked_set(maxFeatures=value)

    def setMaxDepth(self, value: int) -> "IForest":
        return self._checked_set(maxDepth=value)

    def setContamination(self, value: float) -> "IForest":
        return self._checked_set(contamination=value)

    def setApproxQuantileRelativeError(self, value: float) -> "IForest":
        return self._checked_set(approxQuantileRelativeError=value)

    def setBootstrap(self, value: bool) -> "IForest":
        return self._checked_set(bootstrap=value)

    def setSeed(self, value: int) -> "IForest":
        return self._checked_set(seed=value)

    def setFeaturesCol(self, value: str) -> "IForest":
        return self._checked_set(featuresCol=value)

    def setLabelCol(self, value: str) -> "IForest":
        return self._checked_set(labelCol=value)

    def setPredictionCol(self, value: str) -> "IForest":
        return self._checked_set(predictionCol=value)

    def setAnomalyScoreCol(self, value: str) -> "IForest":
        return self._checked_set(anomalyScoreCol=value)

    # ------------------------------------------------------------------ fit
    @staticmethod
    def _phase(name: str, t0: float) -> float:
        """Optional phase timing to stderr (SPARK_IFOREST_TIMING=1)."""
        import os
        import sys
        import time

        t1 = time.time()
        if os.environ.get("SPARK_IFOREST_TIMING"):
            print(f"[iforest-fit] {name}: {t1 - t0:.2f}s", file=sys.stderr, flush=True)
        return t1

    def _fit(self, dataset: DataFrame) -> "IForestModel":
        import time as _time

        _t = _time.time()
        self._validate_params()
        features_col = self.getFeaturesCol()
        _validate_features_schema(dataset, features_col)
        num_trees = self.getNumTrees()
        max_samples = self.getMaxSamples()
        bootstrap = self.getBootstrap()
        seed = self.getSeed()
        spark = dataset.sparkSession

        feats = dataset.select(_features_as_array(dataset, features_col).alias("features"))

        n = feats.count()
        _t = self._phase("count", _t)
        if n == 0:
            raise ValueError("cannot fit on an empty dataset")
        fraction = max_samples / n if max_samples > 1 else max_samples
        if fraction > 1.0:
            # reference: require(fraction <= 1.0, ...) IForest.scala:410
            raise ValueError("The max samples must be less then total number of the input data")
        psi = int(fraction * n)  # possibleMaxSamples, IForest.scala:412
        psi = max(psi, 1)

        # driver-memory guard, same arithmetic as IForest.scala:507-511
        usage_mb = num_trees * 2 * psi * 32 / (1024 * 1024)
        if usage_mb > 256:
            import warnings

            warnings.warn(
                "The isolation forest stored on the driver will exceed 256M memory. "
                "If your machine can not bear memory consuming, please try small "
                "numTrees or maxSamples."
            )

        rng = np.random.default_rng(seed & 0x7FFFFFFF)

        if fraction >= 1.0 and not bootstrap:
            # Every tree trains on ALL rows (reference reservoir k=n of n) —
            # no ids needed: broadcast-cross-join the tree-id table.
            tree_ids = spark.range(num_trees).select(F.col("id").cast("int").alias("treeId"))
            joined = feats.crossJoin(F.broadcast(tree_ids))
        else:
            joined = self._sample_assign(spark, feats, n, psi, num_trees, bootstrap, rng)
        _t = self._phase("sample_assign", _t)

        max_depth = self.getMaxDepth()
        max_features = self.getMaxFeatures()

        def build(pdf: pd.DataFrame) -> pd.DataFrame:
            tree_id = int(pdf["treeId"].iloc[0])
            x = np.asarray(pdf["features"].to_list(), dtype=np.float64)
            tree = train_tree(x, max_depth, max_features, seed, tree_id)
            return pd.DataFrame(
                tree_to_rows(tree_id, tree),
                columns=[
                    "treeID",
                    "id",
                    "featureIndex",
                    "featureValue",
                    "leftChild",
                    "rightChild",
                    "numInstance",
                ],
            )

        # Arrow collection + vectorized assembly (round 6): toPandas moves
        # the ~numTrees*2*psi node rows in columnar batches and
        # pandas_to_forest slices numpy columns — vs ~7 Python field
        # accesses per node through Row objects (profiled ~0.5 s at 100
        # trees).
        # Explicit repartition by treeId (round 7): the assignment relation
        # is only numTrees*psi rows (~a few MB), so AQE's size-based
        # coalescing folds the grouped stage into ONE partition and all
        # numTrees tree builds run serially in a single Python worker —
        # the same cliff segmented._cluster_by_key documents. A
        # user-specified partition count is exempt from coalescing and
        # satisfies the grouped distribution requirement directly.
        from spark_iforest_spark.functions import shuffle_partitions

        n_build = min(num_trees, shuffle_partitions(spark))
        node_pdf = (
            joined.repartition(n_build, "treeId")
            .groupBy("treeId")
            .applyInPandas(build, schema=FLAT_NODE_SCHEMA)
            .toPandas()
        )
        _t = self._phase("tree_build_collect", _t)
        trees = pandas_to_forest(node_pdf)
        if len(trees) != num_trees:
            raise RuntimeError(f"expected {num_trees} trees, built {len(trees)}")

        model = IForestModel(trees=trees)
        model._resetUid(self.uid + "_model")
        self._copyValues(model)
        model._set_parent_estimator(self)

        # Reference fit eagerly transforms the training set, fixing the
        # model threshold from training-score quantiles (IForest.scala:542-548).
        # Fit already counted the input — hand the size to transform so the
        # exact-threshold path can use the order-statistic plan without a
        # second count job (consumed once, see _transform).
        model._threshold_n_hint = n
        predictions = model.transform(dataset)
        _t = self._phase("eager_transform_threshold", _t)
        model._summary = IForestSummary(
            predictions,
            features_col,
            self.getPredictionCol(),
            self.getAnomalyScoreCol(),
        )
        return model

    def _sample_assign(
        self,
        spark,
        feats: DataFrame,
        n: int,
        psi: int,
        num_trees: int,
        bootstrap: bool,
        rng: np.random.Generator,
    ) -> DataFrame:
        """Per-tree sample via candidate pool + driver assignment table.

        Uniform k-of-n sampling composes: a Bernoulli-sampled pool of the
        input is a uniform subset, and a uniform psi-of-pool draw is then a
        uniform psi-of-n draw. This keeps the shuffled volume at
        O(numTrees * psi) rows no matter how large the input is, instead of
        zipWithIndex-ing the whole dataset like the reference
        (IForest.scala:471-483). Row "ids" come from a hash of the feature
        vector, so the plan is deterministic for a given (data, seed)
        regardless of partition layout.

        For bootstrap, draws-with-replacement from the pool only
        approximate draws-with-replacement from the full input (duplicate
        multiplicity differs in O(psi/n)); exact when the pool is the whole
        input (small n), which is where anyone would notice.

        Joint-distribution caveat (PARITY.md deviation 2): all trees draw
        from the SAME pool, so while each tree's sample is exactly uniform
        psi-of-n, pairwise tree-sample overlap at n >> pool size is
        ~psi/(1.1*numTrees) instead of the reference's psi^2/n — trees are
        mildly positively correlated, a slightly smaller effective
        ensemble. AUC parity is pinned in test_reference_parity.
        """
        seed = self.getSeed()
        target_pool = int(_POOL_OVERSAMPLE * num_trees * psi) + _POOL_SLACK
        pool_fraction = min(1.0, target_pool / n)

        # u (30-bit hash scaled to [0,1)) drives the Bernoulli pool filter;
        # rid ORDER uses the full 64-bit hash — 30 bits collide between
        # distinct vectors at pool sizes >~ 2^15 and row_number tie order is
        # partition-layout-dependent, so sorting by u alone would weaken the
        # layout-independence claim. Full-64-bit ties happen only for
        # identical feature vectors, which are interchangeable for training.
        denom = 1 << 30
        h = F.xxhash64(F.col("features"), F.lit(seed))
        pool = feats.select(
            F.col("features"), h.alias("h"), (F.pmod(h, F.lit(denom)) / denom).alias("u")
        )
        if pool_fraction < 1.0:
            pool = pool.where(F.col("u") < pool_fraction)
        # pools are localCheckpoint'd, not cache()d: same one-pass
        # materialization, but the lineage truncation freezes the partition
        # layout (no silent recompute after cache eviction) and Spark's
        # ContextCleaner reclaims the blocks once the fit drops its
        # reference. TRADEOFF: localCheckpoint blocks are NOT fault-tolerant
        # — losing an executor mid-fit fails the job instead of recomputing
        # as cache() would. Acceptable here because a fit is one bounded job
        # (re-run it); deterministic rids make the retry bit-identical. For
        # clusters where executor loss is routine, set
        # spark.spark_iforest.reliableCheckpoint=true + a checkpoint dir
        # (checkpoint.snapshot) at the cost of a distributed-FS round-trip.
        # references — cache() entries would pin executor memory forever.
        if target_pool <= _POOL_GLOBAL_SORT_MAX:
            # absolute-maxSamples regime: pool is O(numTrees*maxSamples) rows
            # regardless of input size — a single-task sort is cheap and makes
            # rids (hence the whole forest) independent of partition layout.
            pool = snapshot(
                pool.withColumn(
                    "rid", F.row_number().over(Window.orderBy(F.col("h"))) - F.lit(1)
                ),
                eager=False,
            )
        else:
            # fractional-maxSamples regime at large n: psi scales with the
            # input, a global sort would bottleneck — assign rids as
            # partition-local row_numbers + driver-computed partition offsets
            # (the classic distributed zipWithIndex). rids then depend on the
            # partition layout; the sampling DISTRIBUTION is unchanged, only
            # bitwise run-to-run reproducibility narrows to fixed layouts.
            part_pool = snapshot(
                pool.withColumn("part", F.spark_partition_id()), eager=False
            )
            counts = {
                r["part"]: r["cnt"]
                for r in part_pool.groupBy("part").agg(F.count(F.lit(1)).alias("cnt")).collect()
            }
            offsets, acc = {}, 0
            for p in sorted(counts):
                offsets[p] = acc
                acc += counts[p]
            offset_col = F.element_at(
                F.create_map(
                    *[F.lit(x) for kv in offsets.items() for x in kv]
                ),
                F.col("part"),
            )
            w = Window.partitionBy("part").orderBy(F.col("h"))
            pool = part_pool.withColumn(
                "rid", F.row_number().over(w) - F.lit(1) + offset_col
            ).drop("part")
        m = pool.count()
        if m < psi:
            # Bernoulli undershoot (possible only on tiny inputs): use all
            # rows, hash-ordered so the fallback stays layout-independent.
            pool = feats.select(
                "features",
                F.row_number().over(Window.orderBy(h)).alias("rid"),
            ).withColumn("rid", F.col("rid") - F.lit(1))
            m = n

        # Driver-side assignment plan (reference O2-O4, IForest.scala:414-462):
        # numTrees × psi indices into the pool.
        tree_col, rid_col, copies_col = [], [], []
        for tree_id in range(num_trees):
            if bootstrap:
                draws = rng.integers(0, m, size=psi)
                rids, copies = np.unique(draws, return_counts=True)
            else:
                rids = rng.choice(m, size=psi, replace=False)
                copies = np.ones(len(rids), dtype=np.int64)
            tree_col.append(np.full(len(rids), tree_id, dtype=np.int32))
            rid_col.append(rids.astype(np.int64))
            copies_col.append(copies.astype(np.int32))

        assign_pdf = pd.DataFrame(
            {
                "rid": np.concatenate(rid_col),
                "treeId": np.concatenate(tree_col),
                "copies": np.concatenate(copies_col),
            }
        )
        # explicit schema: without it createDataFrame runs driver-side
        # schema inference over all numTrees×psi rows (~1.4 s of pure
        # Python at 100 trees — profiled round 6); with it the conversion
        # is a typed fast path
        assign = spark.createDataFrame(
            assign_pdf, schema="rid long, treeId int, copies int"
        )

        joined = pool.join(F.broadcast(assign), "rid", "inner")
        if bootstrap:
            joined = joined.select(
                "features", "treeId", F.explode(F.expr("sequence(1, copies)")).alias("_copy")
            ).drop("_copy")
        else:
            joined = joined.select("features", "treeId")
        return joined

    # Params.copy default (shallow copy + param re-copy) is sufficient.


class IForestModel(Model, IForestParams, MLWritable, MLReadable):
    """Fitted forest (reference: IForest.scala:39-315).

    Mutable non-Param ``threshold`` state matches the reference
    (IForest.scala:49-75): −1 until the first transform computes it from
    ``contamination`` via approxQuantile; NOT persisted — a loaded model
    recomputes it on first transform (IForest.scala:283-296).
    """

    def __init__(self, trees: list[Tree] | None = None):
        super().__init__()
        self._set_default_params()
        self._trees: list[Tree] = trees or []
        self._packed: PackedForest | None = None
        self._forest_bc = None
        self._forest_bc_app: str | None = None
        self._threshold: float = -1.0
        self._threshold_n_hint: int | None = None
        self._summary: IForestSummary | None = None
        self._parent_estimator = None

    def _set_parent_estimator(self, est) -> None:
        self._parent_estimator = est

    # ------------------------------------------------------------- access
    @property
    def trees(self) -> list[Tree]:
        return self._trees

    def getThreshold(self) -> float:
        return self._threshold

    def setThreshold(self, value: float) -> "IForestModel":
        self._threshold = float(value)
        return self

    @property
    def hasSummary(self) -> bool:
        return self._summary is not None

    @property
    def summary(self) -> "IForestSummary":
        if self._summary is None:
            raise RuntimeError(
                "No training summary available for this IForestModel (e.g. a loaded model)"
            )
        return self._summary

    def _packed_forest(self) -> PackedForest:
        if self._packed is None:
            if not self._trees:
                raise RuntimeError("model has no trees")
            self._packed = pack_forest(self._trees)
        return self._packed

    def _forest_broadcast(self, spark):
        """One sparkContext.broadcast of the packed forest per model per
        application, reused across transform() calls — repeated transforms
        on a long-lived session must not accrue executor copies. The
        broadcast is destroyed by Spark's ContextCleaner once the model is
        garbage collected."""
        sc = spark.sparkContext
        if self._forest_bc is None or self._forest_bc_app != sc.applicationId:
            self._forest_bc = sc.broadcast(self._packed_forest())
            self._forest_bc_app = sc.applicationId
        return self._forest_bc

    # ---------------------------------------------------------- transform
    def _transform(self, dataset: DataFrame) -> DataFrame:
        features_col = self.getFeaturesCol()
        _validate_features_schema(dataset, features_col)
        score_col = self.getAnomalyScoreCol()
        pred_col = self.getPredictionCol()
        max_samples = self.getMaxSamples()

        if max_samples > 1.0:
            psi = float(max_samples)
        else:
            if dataset.isStreaming:
                raise ValueError(
                    "streaming transform requires an absolute maxSamples (> 1); "
                    "a fractional maxSamples needs a count() of the input "
                    "(reference semantics, IForest.scala:87-89)"
                )
            # Reference recomputes the normalizer from the *scored* dataset's
            # size — same row can score differently on different-sized inputs
            # (README.md:56). Preserved.
            psi = max_samples * dataset.count()

        spark = dataset.sparkSession
        score_udf = make_score_udf(
            self._packed_forest(), psi, bc=self._forest_broadcast(spark)
        )
        scored = dataset.withColumn(
            score_col, score_udf(_features_as_array(dataset, features_col))
        )

        if self._threshold < 0:
            if dataset.isStreaming:
                raise ValueError(
                    "streaming transform requires setThreshold(...); the "
                    "contamination-quantile threshold needs a batch pass"
                )
            self._threshold = self._compute_threshold(dataset, scored, score_col)

        # Catalyst expression instead of the reference's predict UDF — stays
        # inside whole-stage codegen.
        return scored.withColumn(
            pred_col,
            F.when(F.col(score_col) > F.lit(self._threshold), 1.0).otherwise(0.0),
        )

    # The exact-threshold order-statistic path funnels the top
    # contamination·n scores into one task; beyond this many rows fall back
    # to the GK sketch (still exact at relErr=0, just slower) rather than
    # single-task-sort an unbounded set.
    _EXACT_TOPK_MAX = 10_000_000

    def _compute_threshold(self, dataset: DataFrame, scored: DataFrame, score_col: str) -> float:
        """Contamination-quantile threshold over the scored dataset.

        relErr == 0 asks for the EXACT quantile. Spark's approxQuantile at
        relErr=0 answers it with a zero-error Greenwald-Khanna sketch whose
        per-partition summaries hold every sample — measured 4-6 s of the
        5.8 s sf0.1 fit, dominating training. The same value is the
        ceil(q·n)-th smallest score (verified empirically against
        approxQuantile and pinned by a property test), i.e. the MIN of the
        top (n − ceil(q·n) + 1) scores — which Spark computes as a
        per-partition partial top-k (TakeOrdered shape): one scoring pass,
        k rows into one final task, ~15× faster at sf0.1. Used whenever k
        is bounded (k ≤ _EXACT_TOPK_MAX); the mergeable-sketch path remains
        for relErr > 0 (the 100 TB configuration, gated separately) and for
        unbounded k. The input size n reuses fit's count via
        _threshold_n_hint (consumed once); a standalone transform pays one
        count job — metadata-cheap on file-backed input.
        """
        import math

        q = 1.0 - self.getContamination()
        rel_err = self.getApproxQuantileRelativeError()
        if rel_err == 0.0:
            n = self._threshold_n_hint
            self._threshold_n_hint = None
            if n is None:
                n = dataset.count()
            rank = math.ceil(q * n)
            k = int(n - rank + 1)
            if n > 0 and 0 < k <= self._EXACT_TOPK_MAX:
                row = (
                    scored.select(F.col(score_col).alias("_s"))
                    .orderBy(F.col("_s").desc())
                    .limit(k)
                    .agg(F.min("_s").alias("_thr"))
                    .collect()[0]
                )
                return float(row["_thr"])
        return scored.approxQuantile(score_col, [q], rel_err)[0]

    def copy(self, extra=None) -> "IForestModel":
        if extra is None:
            extra = {}
        that = IForestModel(trees=self._trees)
        that._resetUid(self.uid)
        self._copyValues(that, extra)
        that._threshold = self._threshold
        that._summary = self._summary
        return that

    # -------------------------------------------------------- persistence
    def write(self) -> MLWriter:
        return IForestModelWriter(self)

    @classmethod
    def read(cls) -> MLReader:
        return IForestModelReader()

    def save(self, path: str) -> None:
        self.write().save(path)

    @classmethod
    def load(cls, path: str) -> "IForestModel":
        return cls.read().load(path)


class IForestModelWriter(MLWriter):
    """Writes metadata JSON + pre-order NodeData parquet — the same on-disk
    layout as the reference (IForest.scala:283-296): ``path/metadata`` and
    ``path/data`` with nested EnsembleNodeData rows."""

    def __init__(self, instance: IForestModel):
        super().__init__()
        self.instance = instance

    def saveImpl(self, path: str) -> None:
        model = self.instance
        DefaultParamsWriter.saveMetadata(model, path, self.sc)
        rows = []
        for tree_id, tree in enumerate(model.trees):
            for (tid, nid, fi, fv, lc, rc, ni) in tree_to_rows(tree_id, tree):
                rows.append((tid, (nid, fi, fv, lc, rc, ni)))
        spark = self.sparkSession
        schema = (
            "treeID INT, nodeData STRUCT<id: INT, featureIndex: INT, "
            "featureValue: DOUBLE, leftChild: INT, rightChild: INT, numInstance: BIGINT>"
        )
        spark.createDataFrame(rows, schema=schema).write.parquet(path + "/data")


class IForestModelReader(MLReader):
    def load(self, path: str) -> IForestModel:
        metadata = DefaultParamsReader.loadMetadata(path, self.sc)
        class_name = metadata["class"]
        if "IForestModel" not in class_name:
            raise ValueError(f"expected IForestModel metadata, found class {class_name}")
        df = self.sparkSession.read.parquet(path + "/data")
        rows = [
            {
                "treeID": r["treeID"],
                "id": r["nodeData"]["id"],
                "featureIndex": r["nodeData"]["featureIndex"],
                "featureValue": r["nodeData"]["featureValue"],
                "leftChild": r["nodeData"]["leftChild"],
                "rightChild": r["nodeData"]["rightChild"],
                "numInstance": r["nodeData"]["numInstance"],
            }
            for r in df.collect()
        ]
        model = IForestModel(trees=rows_to_forest(rows))
        model._resetUid(metadata["uid"])
        DefaultParamsReader.getAndSetParams(model, metadata)
        return model


class IForestSummary:
    """Training summary (reference: IForest.scala:896-908)."""

    def __init__(
        self,
        predictions: DataFrame,
        features_col: str,
        prediction_col: str,
        anomaly_score_col: str,
    ):
        self.predictions = predictions
        self.featuresCol = features_col
        self.predictionCol = prediction_col
        self.anomalyScoreCol = anomaly_score_col

    @property
    def anomalies(self) -> DataFrame:
        return self.predictions.select(self.predictionCol)

    @property
    def anomalyScores(self) -> DataFrame:
        return self.predictions.select(self.anomalyScoreCol)

    @property
    def numAnomalies(self) -> int:
        # df.where(...).count() — NOT the reference's collect().length
        # anti-pattern (IForest.scala:907).
        return self.anomalies.where(F.col(self.predictionCol) > 0).count()
