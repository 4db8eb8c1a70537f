"""ray-jigsaw: a Ray-Data-native spatial-join + tiling engine with the
capabilities of tonytw1/osm-jigsaw (see SURVEY.md for the blueprint)."""

__version__ = "0.1.0"

ROOT_AREA_ID = -1  # synthetic graph root (GraphBuilder.scala:18-24 analog)
