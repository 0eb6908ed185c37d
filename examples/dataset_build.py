"""Building a Dataset from raw records (reference: doc/examples/dataset.rst).

The reference's walkthrough downloads the Book-Crossing dump and goes from
raw CSV rows (string user ids, ISBNs, author names) to model-ready sparse
matrices via ``Dataset``.  This environment has no network egress, so this
script synthesizes raw records with exactly the same shape — dicts with
``User-ID`` / ``ISBN`` / ``Book-Author`` string fields — and walks the same
steps:

1. ``Dataset.fit`` on the id iterables to build the id -> index mappings
2. ``fit_partial`` to add feature mappings incrementally
3. ``build_interactions`` -> (interactions, weights) COO matrices
4. ``build_item_features`` -> normalized CSR [identity | author] features
5. fit a model and recommend for a raw (string) user id via ``mapping()``

Swap ``synthesize_records`` for your own log reader and everything else
is unchanged — the point of ``Dataset`` is that raw ids never need to be
contiguous integers.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))  # run from the repo

import numpy as np

from lightfm_tpu import LightFM
from lightfm_tpu.data import Dataset


def synthesize_records(n_users=400, n_books=600, n_authors=80, seed=3):
    """Raw 'book ratings' + 'book features' records, Book-Crossing-shaped."""
    rng = np.random.RandomState(seed)
    isbns = [f"{rng.randint(10**9):09d}X" for _ in range(n_books)]
    authors = [f"Author {i:03d}" for i in range(n_authors)]
    book_author = {isbn: authors[rng.randint(n_authors)] for isbn in isbns}

    # Users prefer a couple of authors: interactions cluster by author so
    # the feature matrix genuinely helps the model below.
    ratings = []
    for u in range(n_users):
        liked = rng.choice(n_authors, size=2, replace=False)
        pool = [i for i in isbns if book_author[i] in (authors[liked[0]], authors[liked[1]])]
        pool = pool or isbns
        for isbn in rng.choice(pool, size=min(12, len(pool)), replace=False):
            ratings.append(
                {"User-ID": f"user-{u:05d}", "ISBN": str(isbn),
                 "Book-Rating": str(rng.randint(1, 11))}
            )
    book_features = [
        {"ISBN": isbn, "Book-Author": book_author[isbn]} for isbn in isbns
    ]
    return ratings, book_features


def main():
    ratings, book_features = synthesize_records()
    print("a raw rating record: ", ratings[0])
    print("a raw feature record:", book_features[0])

    # 1. id mappings: internal indices are consecutive integers, raw ids
    # are whatever your systems use.
    dataset = Dataset()
    dataset.fit(
        (x["User-ID"] for x in ratings),
        (x["ISBN"] for x in ratings),
    )
    num_users, num_items = dataset.interactions_shape()
    print(f"Num users: {num_users}, num_items {num_items}.")

    # 2. add feature mappings (and any items that never appear in the
    # interaction log) without rebuilding: fit_partial extends in place.
    dataset.fit_partial(
        items=(x["ISBN"] for x in book_features),
        item_features=(x["Book-Author"] for x in book_features),
    )

    # 3. interactions: (user id, item id) or (user id, item id, weight).
    interactions, weights = dataset.build_interactions(
        (x["User-ID"], x["ISBN"], float(x["Book-Rating"])) for x in ratings
    )
    print(repr(interactions))

    # 4. item features: (item id, [feature, ...]); identity features are
    # kept by default so items without metadata still get an embedding.
    item_features = dataset.build_item_features(
        (x["ISBN"], [x["Book-Author"]]) for x in book_features
    )
    print(repr(item_features))

    # 5. fit and recommend for a raw user id.
    model = LightFM(loss="warp", random_state=42)
    model.fit(interactions, item_features=item_features, epochs=10)

    user_map, _, item_map, _ = dataset.mapping()
    inv_item = {v: k for k, v in item_map.items()}
    uid = user_map["user-00000"]
    scores = model.predict(uid, np.arange(interactions.shape[1]),
                           item_features=item_features)
    top = np.argsort(-scores)[:5]
    print("top-5 for user-00000:", [str(inv_item[i]) for i in top])


if __name__ == "__main__":
    main()
