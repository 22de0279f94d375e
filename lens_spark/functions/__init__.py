"""Column-level functions: mime sniffing, tokenization, text analysis."""
