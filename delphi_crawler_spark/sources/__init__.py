"""Source connectors: ordered scans, index-record parsing, snapshot tables."""
