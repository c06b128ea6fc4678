"""Lazy DataFrame->DataFrame operators; the engine's library surface."""
