"""Source connectors: everything that turns external payloads into typed
DataFrames. Web scraping itself (HTTP, politeness, retries — reference
scrapers S12-S15) is driver-side and out of engine scope; the engine-side
work is the flattening/typing of fetched payloads."""
