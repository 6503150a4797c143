"""Batch sources: payload-shape formatters for the reference's two
REST feeds (OpenSky state vectors, Open-Meteo current weather).

Network fetching is a transport detail kept out of the engine (the
reference's extract tasks, S1-S3); these modules own the *in-Spark*
normalization of the raw JSON shapes, replacing the reference's
driver-side Python loops with native expressions so formatting
scales with the cluster instead of the driver.
"""
