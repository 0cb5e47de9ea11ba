"""Dataset sources: synthetic Common-Crawl-style webtext, testdata tables."""

from de_ray.sources.webtext import (  # noqa: F401
    WEBTEXT_SCHEMA,
    render_html,
    synth_webtext,
    webtext_dataset,
    webtext_dir_for,
)
