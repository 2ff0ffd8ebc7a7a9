"""Query plans: the iterated-batch crawl round (the reference's
MavenDiscoveryProcess stream graph re-expressed as DataFrame plans) and the
pure-Python scheduler oracle used by the correctness gates."""
