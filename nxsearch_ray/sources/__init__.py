from nxsearch_ray.sources.pages import (  # noqa: F401
    pages_dataset,
    pages_from_documents,
    pages_table,
)
