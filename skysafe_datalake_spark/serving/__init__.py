"""Serving-side ops tooling (outside the Spark engine proper):
dashboard provisioning for the Kibana boundary."""
