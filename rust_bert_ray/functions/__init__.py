"""Oracle-checkable operator library over the driver's parquet tables.

Every function takes ``sf_dir`` (a /root/testdata/sf* directory) and
returns a ``ray.data.Dataset`` whose column names match the paired SQL in
``__ray_entry__.oracle_sql()`` exactly.
"""
