"""Driver-side plans: crawl iteration, snapshot state store, metrics."""
