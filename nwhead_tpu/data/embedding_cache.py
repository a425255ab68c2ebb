"""Feature-bank disk cache (legacy capability parity).

The legacy eval flow precomputes backbone features once and caches them to
``embeddings.npy`` / ``labels.npy`` on disk (``legacy/data/embedding.py:18-44``).
Equivalent here: save/load the precomputed support bank so repeated
inference runs skip the featurizer pass, and an ``EmbeddingDataset``-style
chunk iterator that feeds the streaming inference path.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Iterator, Optional, Tuple

import numpy as np


class FeatureBankCache:
    def __init__(self, cache_dir: str) -> None:
        self.cache_dir = cache_dir
        self.emb_path = os.path.join(cache_dir, "embeddings.npy")
        self.lbl_path = os.path.join(cache_dir, "labels.npy")
        self.meta_path = os.path.join(cache_dir, "metadata.npy")
        self.tag_path = os.path.join(cache_dir, "tag.json")

    def exists(self) -> bool:
        return os.path.exists(self.emb_path) and os.path.exists(self.lbl_path)

    def save(
        self,
        embeddings: np.ndarray,
        labels: np.ndarray,
        metadata: Optional[np.ndarray] = None,
        tag: Optional[Dict[str, str]] = None,
    ) -> None:
        os.makedirs(self.cache_dir, exist_ok=True)
        np.save(self.emb_path, np.asarray(embeddings))
        np.save(self.lbl_path, np.asarray(labels))
        if metadata is not None:
            np.save(self.meta_path, np.asarray(metadata))
        if tag is not None:
            with open(self.tag_path, "w") as f:
                json.dump(tag, f)

    def load(self) -> Tuple[np.ndarray, np.ndarray, Optional[np.ndarray]]:
        emb = np.load(self.emb_path)
        lbl = np.load(self.lbl_path)
        meta = np.load(self.meta_path) if os.path.exists(self.meta_path) else None
        return emb, lbl, meta

    def load_tag(self) -> Optional[Dict[str, str]]:
        """Provenance of the cached features (featurizer precision / arch /
        dataset), written by ``save(tag=...)``. Cached features are only
        valid when queries run through the SAME featurizer config — callers
        must refuse a mismatched tag rather than mix feature spaces."""
        if not os.path.exists(self.tag_path):
            return None
        with open(self.tag_path) as f:
            return json.load(f)

    def chunks(self, chunk_size: int = 1024, mmap: bool = True) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        """Chunk iterator over the cached bank (memory-mapped) — plugs into
        ``nw.streaming.nw_streaming_log_probs`` for banks larger than RAM."""
        emb = np.load(self.emb_path, mmap_mode="r" if mmap else None)
        lbl = np.load(self.lbl_path, mmap_mode="r" if mmap else None)
        for start in range(0, len(emb), chunk_size):
            yield np.asarray(emb[start : start + chunk_size]), np.asarray(
                lbl[start : start + chunk_size]
            )
