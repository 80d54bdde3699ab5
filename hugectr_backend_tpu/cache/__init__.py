from hugectr_backend_tpu.cache.embedding_cache import EmbeddingCache, CacheConfig

__all__ = ["EmbeddingCache", "CacheConfig"]
