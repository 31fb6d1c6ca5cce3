"""fscrawler_ray — a Ray-Data-native crawl + data-processing engine.

A from-scratch reimagining of the capabilities of ManuelLang/FsCrawler
(reference at /root/reference, see SURVEY.md) as a distributed URL-frontier
+ fetch scheduler over Arrow tables of image+caption pairs:

- ``fscrawler_ray.functions``  — vectorized kernels (xxh64, codecs, phash, urls, text)
- ``fscrawler_ray.filters``    — the vectorized filter chain (reference F1-F9 semantics)
- ``fscrawler_ray.sources``    — deterministic synthetic web/fetch + table store
- ``fscrawler_ray.stages``     — map_batches stages (decode/hash/attrs/keywords/...)
- ``fscrawler_ray.state``      — bloom/cuckoo seen-set, frontier actors, checkpoints
- ``fscrawler_ray.crawl``      — single-threaded oracle + distributed crawl engine
- ``fscrawler_ray.pipelines``  — end-to-end pipelines and analytics queries

Library code never calls ``ray.init()``; sessions are owned by the driver,
``bench.py``, or the pytest fixture.
"""

__version__ = "0.1.0"
