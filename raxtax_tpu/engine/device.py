"""Device classification engine.

Orchestrates the TPU pipeline per query batch (SURVEY.md §7 design):

  host: k-mer extraction, packing, exact-match lookup
    -> device: intersection counts        (MXU bit-matmul or Pallas kernel)
    -> device: intersection-size histogram (MXU outer-product)
  host: per-K memoized f64 probability tables from histograms
    -> device: per-size table gather, cumsum, eval-node range sums,
               significance top-k compaction
    -> device: max-confidence fallback descents (batched)
  host: exact replay of the evaluation recursion over significant nodes,
        exact-match policy, formatting.

All O(num_refs) reductions happen on device; the host touches only
histograms, (K+1)-sized tables, and the compacted significant set.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field

import numpy as np

from ..db.bitmatrix import pack_query_kmers
from ..db.database import Database
from ..db.taxonomy import NODE_INNER, ROOT
from ..lineage.evaluate import evaluate_significant
from ..models.oracle import (
    OracleClassifier,
    QueryResult,
    apply_exact_match_policy,
)
from ..prob.model import KTableCache, normalized_size_probs
from ..utils.encoding import round_half_away, sequence_to_kmers

log = logging.getLogger("raxtax")

TOP_K = 1024


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@dataclass
class DeviceClassifier:
    """Batched classifier running the count/histogram/aggregation pipeline
    on the default JAX device (single-chip; see parallel/ for meshes)."""

    db: Database
    skip_exact_matches: bool
    raw_confidence: bool
    backend: str
    batch_size: int
    # device-resident state
    pipeline: object = field(repr=False, default=None)  #: ShardedPipeline | None
    ref_bits: object = field(repr=False, default=None)
    node_starts: object = field(repr=False, default=None)
    node_ends: object = field(repr=False, default=None)
    _cache: KTableCache = field(default_factory=KTableCache, repr=False)
    _oracle: OracleClassifier = field(default=None, repr=False)

    @classmethod
    def create(
        cls,
        db: Database,
        skip_exact_matches: bool = False,
        raw_confidence: bool = False,
        backend: str = "auto",
        batch_size: int | None = None,
        mesh=None,
    ) -> "DeviceClassifier":
        import jax.numpy as jnp

        if backend == "auto":
            import jax

            backend = "pallas" if jax.devices()[0].platform == "tpu" else "xla"
        tax = db.taxonomy
        eval_ids = tax.eval_ids
        self = cls(
            db=db,
            skip_exact_matches=skip_exact_matches,
            raw_confidence=raw_confidence,
            backend=backend,
            batch_size=batch_size or 256,
        )
        if mesh is not None:
            from ..parallel.mesh import ShardedPipeline

            self.pipeline = ShardedPipeline.create(db, mesh)
            # keep the batch divisible over the data axis
            d = mesh.shape["data"]
            self.batch_size = _round_up(self.batch_size, d)
        elif backend == "xla":
            self.ref_bits = jnp.asarray(db.ref_major)
        self.node_starts = jnp.asarray(tax.range_start[eval_ids])
        self.node_ends = jnp.asarray(tax.range_end[eval_ids])
        self._oracle = OracleClassifier(
            db, skip_exact_matches=skip_exact_matches, raw_confidence=raw_confidence
        )
        if backend == "pallas":
            from ..ops.intersect_pallas import prepare_kmer_major

            self.kmer_major = prepare_kmer_major(db)
        elif backend == "stream":
            from ..ops.intersect_stream import prepare_kmer_major_stream

            self.kmer_major = prepare_kmer_major_stream(db)
        return self

    # ------------------------------------------------------------------

    def _counts(self, query_bits, kmer_idx, kmer_counts):
        import jax.numpy as jnp

        from ..ops.intersect_xla import intersection_counts_xla

        if self.backend == "pallas":
            from ..ops.intersect_pallas import intersection_counts_pallas

            return intersection_counts_pallas(
                kmer_idx, self.kmer_major, self.db.num_tips
            )
        if self.backend == "stream":
            from ..ops.intersect_stream import intersection_counts_stream

            return intersection_counts_stream(
                kmer_idx, self.kmer_major, self.db.num_tips
            )
        return intersection_counts_xla(jnp.asarray(query_bits), self.ref_bits)

    def classify_batch(
        self, chunk: list[tuple[str, np.ndarray]]
    ) -> list[QueryResult]:
        import jax.numpy as jnp

        from ..ops.histogram import intersection_histogram
        from ..ops.intersect_xla import zero_reference_ids
        from ..ops.nodeconf import significant_nodes

        tax = self.db.taxonomy
        n_real = len(chunk)
        B = self.batch_size
        labels = [l for l, _ in chunk]
        seqs = [s for _, s in chunk]
        kmer_sets = [sequence_to_kmers(s) for s in seqs]
        for km in kmer_sets:
            assert km.size <= 0xFFFF, "too many distinct query k-mers"
        # pad the batch to the fixed size with empty queries
        kmer_sets += [np.empty(0, np.uint16)] * (B - n_real)
        exact = [self.db.exact_matches(s) for s in seqs]

        query_bits = pack_query_kmers(kmer_sets)
        k_pad = _round_up(max((k.size for k in kmer_sets), default=1) or 1, 32)
        kmer_idx = np.full((B, k_pad), 0x10000, dtype=np.int32)
        for i, km in enumerate(kmer_sets):
            kmer_idx[i, : km.size] = km

        ks = [int(k.size) for k in kmer_sets]
        s_max = _round_up(max(ks) + 1, 128)
        e_pad = (
            max((len(e) for e in exact), default=0)
            if self.skip_exact_matches
            else 0
        )
        ids = np.full((B, max(e_pad, 1)), -1, dtype=np.int32)
        if e_pad:
            for i, e in enumerate(exact):
                ids[i, : len(e)] = e

        if self.pipeline is not None:
            counts, hist = self.pipeline.counts_and_hist(
                query_bits, ids, s_max
            )
        else:
            counts = self._counts(
                query_bits, kmer_idx, [k.size for k in kmer_sets]
            )
            if e_pad:
                counts = zero_reference_ids(counts, jnp.asarray(ids))
            hist = np.asarray(intersection_histogram(counts, s_max))

        # host f64 stage: per-size probabilities + global signal
        table = np.zeros((B, s_max), dtype=np.float32)
        tables64: list[np.ndarray | None] = [None] * B
        global_signals = np.zeros(B, dtype=np.float64)
        inv_n = 1.0 / self.db.num_tips
        for b in range(n_real):
            K = ks[b]
            probs_size, _ = normalized_size_probs(hist[b], K, self._cache)
            h = hist[b, : probs_size.shape[0]].astype(np.float64)
            global_signals[b] = np.sqrt(h @ (probs_size - inv_n) ** 2)
            table[b, : probs_size.shape[0]] = probs_size
            tables64[b] = probs_size

        if self.pipeline is not None:
            vals, idx, n_sig, node_conf = self.pipeline.significant(
                counts, table, TOP_K
            )
        else:
            vals, idx, n_sig, node_conf = significant_nodes(
                counts,
                jnp.asarray(table),
                self.node_starts,
                self.node_ends,
                top_k=TOP_K,
            )
            vals = np.asarray(vals)
            idx = np.asarray(idx)
            n_sig = np.asarray(n_sig)

        # collect fallback descent sites across the batch
        eval_ids = tax.eval_ids
        sig_sets: list[dict[int, float]] = []
        sites: list[tuple[int, int]] = []  # (query, eval_pos)
        overflow: list[int] = []
        for b in range(n_real):
            m = int(n_sig[b])
            if m > vals.shape[1]:
                overflow.append(b)
                sig_sets.append({})
                continue
            sig = {
                int(eval_ids[idx[b, j]]): float(vals[b, j]) for j in range(m)
            }
            sig_sets.append(sig)
            # Fallback sites must mirror evaluate_significant's pruning: the
            # device threshold has f32 slack below the 0.005 rounding cutoff,
            # so a raw-significant child can still round to zero — making its
            # parent a fallback site.
            rounded_sig = {
                n
                for n, v in sig.items()
                if round_half_away(v) != 0.0 and n != ROOT
            }
            parents_of_sig = {int(tax.parent[n]) for n in rounded_sig}
            for n in rounded_sig | {ROOT}:
                if tax.node_type[n] == NODE_INNER and n not in parents_of_sig:
                    sites.append((b, int(tax.eval_pos[n])))

        # Fallback descents run on host in f64: the argmax compares
        # near-equal child confidences, where f32 cumsum cancellation can
        # disagree with the reference's f64 ordering. Only the exact counts
        # rows of affected queries cross back to the host.
        fallback_map: dict[tuple[int, int], int] = {}
        if sites:
            fb_queries = sorted({b for b, _ in sites})
            rows = np.asarray(counts[np.asarray(fb_queries)])[
                :, : self.db.num_tips
            ].astype(np.int64)
            for row, b in zip(rows, fb_queries):
                probs = tables64[b][row]
                cum0 = np.concatenate(([0.0], np.cumsum(probs)))
                conf64 = (
                    cum0[tax.range_end] - cum0[tax.range_start]
                )  # per global node
                for b2, pos in sites:
                    if b2 != b:
                        continue
                    cur = int(eval_ids[pos])
                    while tax.node_type[cur] == NODE_INNER:
                        kids = tax.children(cur)
                        vals_k = conf64[kids]
                        # Rust max_by keeps the LAST maximal element
                        best = len(vals_k) - 1 - int(np.argmax(vals_k[::-1]))
                        cur = int(kids[best])
                    fallback_map[(b, int(eval_ids[pos]))] = cur

        out: list[QueryResult] = []
        for b in range(n_real):
            if b in overflow:
                # significant set exceeded the compaction budget (extremely
                # diffuse match profile): exact host fallback
                log.debug(
                    "query %s: significant-set overflow, host fallback",
                    labels[b],
                )
                out.append(self._oracle.classify(labels[b], seqs[b]))
                continue
            results = evaluate_significant(
                tax,
                labels[b],
                sig_sets[b],
                float(global_signals[b]),
                lambda node, _b=b: fallback_map[(_b, node)],
            )
            assert results, "evaluation must produce at least one result"
            results, warned = apply_exact_match_policy(
                labels[b],
                self.db,
                exact[b],
                results,
                self.raw_confidence,
                self.skip_exact_matches,
            )
            out.append(
                QueryResult(
                    label=labels[b],
                    results=results,
                    sequence=seqs[b],
                    mislabel_warning=warned,
                )
            )
        return out
