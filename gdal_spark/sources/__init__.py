"""Vector format drivers re-expressed as Spark sources/sinks.

The reference ships 76 vector format drivers (``ogr/ogrsf_frmts/*``); this
package implements the high-traffic interchange subset as real distributed
readers/writers over public format specs:

* ``geojson``  — RFC 7946 GeoJSON: line-delimited GeoJSONSeq (splittable,
  the at-scale layout) and single-document FeatureCollection.
* ``shapefile`` — ESRI Shapefile (.shp/.shx/.dbf), pure-numpy codec.
* ``gpkg``     — OGC GeoPackage (SQLite + GPKG geometry blobs), stdlib
  sqlite3 with executor-side ``deserialize``.
* ``flatgeobuf`` — FlatGeobuf (flatbuffers Header/Feature records + packed
  Hilbert R-tree), minimal hand-rolled flatbuffers codec.

Everything decodes to the engine's native layout (``rings`` =
``array<array<array<double>>>`` for polygons, ``lon``/``lat`` doubles for
points) so every downstream operator applies unchanged.
"""
