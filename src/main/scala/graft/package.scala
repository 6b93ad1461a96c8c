/**
 * graft — a Spark-native analytics engine with the query and
 * data-processing capabilities of the moj-analytical-services
 * etl-pipeline-example reference, re-expressed as idiomatic Catalyst
 * plans and extended with the operators a large-scale training-data
 * pipeline needs.
 *
 * Module map (details in README.md / SURVEY.md §2):
 *
 *  - [[graft.meta]] / [[graft.align]] / [[graft.validate]] — the
 *    reference's JSON schema system, align-to-metadata, and data gates.
 *  - [[graft.io]] — zoned storage: JSONL.gz/parquet/CSV/ORC scans and
 *    sinks, partitioned/bucketed/dynamic-overwrite writes, promotion,
 *    quarantine, compaction.
 *  - [[graft.catalog]] — database/table DDL from metadata, partition
 *    repair.
 *  - [[graft.pipeline]] — fail-fast orchestration, the re-enacted
 *    reference pipeline, per-action observability.
 *  - [[graft.ops]] — relational operators Spark lacks as built-ins:
 *    as-of joins, sessionization, EWMA, range-join binning, skew
 *    salting, sampling/splits, sequence packing, mixture interleave,
 *    grouped top-k, MERGE/SCD2, incremental rollup state, distinct
 *    sketches/bitmaps, Z-order layout.
 *  - [[graft.ext]] — dedup (exact/Jaccard/MinHash-LSH/SimHash +
 *    clustering + decontamination), similarity search (VecDot, LSH,
 *    IVF), text statistics, multimodal stubs.
 *  - [[graft.functions]] — custom Catalyst expressions and the
 *    optimizer rule that rewrites portable HOF patterns onto them;
 *    install via `spark.sql.extensions=graft.functions.GraftExtensions`.
 *  - [[graft.streaming]] — Structured Streaming twins of the batch
 *    operators plus AvailableNow land-zone ingest.
 *  - [[graft.queries]] — the declared, DuckDB-oracled query surface
 *    ([[graft.SparkEntry]] is the driver contract).
 */
package object graft
