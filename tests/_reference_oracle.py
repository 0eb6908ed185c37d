"""Slow sequential SGD oracle used for differential testing and calibration.

A from-scratch numpy implementation of the reference's per-sample training
algorithm (`_lightfm_fast.pyx.template:694-1182`): sequential sample-at-a-time
updates, WARP's sample-until-violation loop, adagrad/adadelta math, lazy L2.
Identity features only (the matrix-factorization special case).  It plays the
same role the pure-Python metric re-implementations play in the reference's
own test suite (`tests/test_evaluation.py:13-160`): an independently written
slow implementation to compare the fast path against statistically.
"""

from __future__ import annotations

import numpy as np

MAX_LOSS = 10.0


class SequentialOracle:
    def __init__(
        self,
        n_users,
        n_items,
        no_components=10,
        loss="warp",
        learning_rate=0.05,
        item_alpha=0.0,
        user_alpha=0.0,
        max_sampled=10,
        learning_schedule="adagrad",
        rho=0.95,
        epsilon=1e-6,
        seed=10,
    ):
        rng = np.random.RandomState(seed)
        self.rng = rng
        self.loss = loss
        self.lr = learning_rate
        self.item_alpha = item_alpha
        self.user_alpha = user_alpha
        self.max_sampled = max_sampled
        self.adadelta = learning_schedule == "adadelta"
        self.rho = rho
        self.eps = epsilon
        self.n_items = n_items

        D = no_components
        self.D = D
        self.item_emb = ((rng.rand(n_items, D) - 0.5) / D).astype(np.float64)
        self.user_emb = ((rng.rand(n_users, D) - 0.5) / D).astype(np.float64)
        self.item_bias = np.zeros(n_items)
        self.user_bias = np.zeros(n_users)
        g0 = 0.0 if self.adadelta else 1.0
        self.item_emb_acc = np.full((n_items, D), g0)
        self.user_emb_acc = np.full((n_users, D), g0)
        self.item_bias_acc = np.full(n_items, g0)
        self.user_bias_acc = np.full(n_users, g0)
        self.item_emb_mom = np.zeros((n_items, D))
        self.user_emb_mom = np.zeros((n_users, D))
        self.item_bias_mom = np.zeros(n_items)
        self.user_bias_mom = np.zeros(n_users)

    # -- single-row optimizer step (template:337-451, identity features) --
    def _step(self, table, acc, mom, row, g, alpha):
        if not self.adadelta:
            lr_local = self.lr / np.sqrt(acc[row])
            table[row] -= lr_local * g
            acc[row] += g * g
            table[row] *= 1.0 + alpha * lr_local
        else:
            acc[row] = self.rho * acc[row] + (1 - self.rho) * g * g
            lr_local = np.sqrt(mom[row] + self.eps) / np.sqrt(acc[row] + self.eps)
            upd = lr_local * g
            mom[row] = self.rho * mom[row] + (1 - self.rho) * upd * upd
            table[row] -= upd
            table[row] *= 1.0 + alpha * lr_local

    def _score(self, u, i):
        return (
            self.user_emb[u] @ self.item_emb[i]
            + self.user_bias[u]
            + self.item_bias[i]
        )

    def _pairwise_update(self, L, u, pos, neg):
        u_rep = self.user_emb[u].copy()
        p_rep = self.item_emb[pos].copy()
        n_rep = self.item_emb[neg].copy()
        self._step(self.item_bias, self.item_bias_acc, self.item_bias_mom, pos, -L, self.item_alpha)
        self._step(self.item_bias, self.item_bias_acc, self.item_bias_mom, neg, L, self.item_alpha)
        self._step(self.user_bias, self.user_bias_acc, self.user_bias_mom, u, L, self.user_alpha)
        self._step(self.item_emb, self.item_emb_acc, self.item_emb_mom, pos, -L * u_rep, self.item_alpha)
        self._step(self.item_emb, self.item_emb_acc, self.item_emb_mom, neg, L * u_rep, self.item_alpha)
        self._step(self.user_emb, self.user_emb_acc, self.user_emb_mom, u, L * (n_rep - p_rep), self.user_alpha)

    def fit_epoch(self, rows, cols, ys, weights, positives):
        """positives: list/dict of sets per user for membership tests."""
        order = self.rng.permutation(len(rows))
        rng = self.rng
        I = self.n_items
        for idx in order:
            u, i, y, w = int(rows[idx]), int(cols[idx]), float(ys[idx]), float(weights[idx])
            if self.loss == "logistic":
                p = 1.0 / (1.0 + np.exp(-self._score(u, i)))
                target = 1.0 if y > 0 else 0.0
                L = w * (p - target)
                u_rep = self.user_emb[u].copy()
                i_rep = self.item_emb[i].copy()
                self._step(self.item_bias, self.item_bias_acc, self.item_bias_mom, i, L, self.item_alpha)
                self._step(self.user_bias, self.user_bias_acc, self.user_bias_mom, u, L, self.user_alpha)
                self._step(self.item_emb, self.item_emb_acc, self.item_emb_mom, i, L * u_rep, self.item_alpha)
                self._step(self.user_emb, self.user_emb_acc, self.user_emb_mom, u, L * i_rep, self.user_alpha)
                continue

            if not y > 0:
                continue

            if self.loss == "warp":
                pos_pred = self._score(u, i)
                sampled = 0
                while sampled < self.max_sampled:
                    sampled += 1
                    neg = rng.randint(I)
                    if self._score(u, neg) > pos_pred - 1:
                        if neg in positives[u]:
                            continue
                        L = min(w * np.log(max(1.0, np.floor((I - 1) / sampled))), MAX_LOSS)
                        self._pairwise_update(L, u, i, neg)
                        break
            elif self.loss == "bpr":
                for _ in range(len(rows)):
                    neg = int(cols[rng.randint(len(cols))])
                    if neg not in positives[u]:
                        break
                L = w * (1.0 - 1.0 / (1.0 + np.exp(-(self._score(u, i) - self._score(u, neg)))))
                self._pairwise_update(L, u, i, neg)

    def fit_epoch_kos(self, rows, positives_lists, positives_sets, k=5, n=10):
        """k-OS WARP epoch (template:915-1071): per shuffled interaction row,
        sample min(n, #pos) of the user's positives with replacement, rank
        them by score, take the min(k, #sampled)-th best as the positive,
        then run the standard WARP inner loop (loss has no sample weight)."""
        order = self.rng.permutation(len(rows))
        rng = self.rng
        I = self.n_items
        for idx in order:
            u = int(rows[idx])
            plist = positives_lists[u]
            if len(plist) == 0:
                continue
            no_pos = min(n, len(plist))
            cand = [plist[rng.randint(len(plist))] for _ in range(no_pos)]
            preds = [(self._score(u, c), c) for c in cand]
            preds.sort(key=lambda t: -t[0])
            pos_pred, pos = preds[min(k, no_pos) - 1]
            sampled = 0
            while sampled < self.max_sampled:
                sampled += 1
                neg = rng.randint(I)
                if self._score(u, neg) > pos_pred - 1:
                    if neg in positives_sets[u]:
                        continue
                    L = min(np.log(max(1.0, np.floor((I - 1) / sampled))), MAX_LOSS)
                    self._pairwise_update(L, u, pos, neg)
                    break

    def auc(self, test_csr, train_csr=None):
        """Plain sklearn-free per-user AUC over all items."""
        scores = self.user_emb @ self.item_emb.T + self.user_bias[:, None] + self.item_bias[None, :]
        aucs = []
        for u in range(test_csr.shape[0]):
            pos = test_csr.indices[test_csr.indptr[u]:test_csr.indptr[u + 1]]
            if len(pos) == 0:
                continue
            mask = np.ones(self.n_items, dtype=bool)
            if train_csr is not None:
                tr = train_csr.indices[train_csr.indptr[u]:train_csr.indptr[u + 1]]
                mask[tr] = False
            neg_scores = scores[u][mask & ~np.isin(np.arange(self.n_items), pos)]
            pos_scores = scores[u][pos]
            if len(neg_scores) == 0:
                continue
            # P(pos > neg) + 0.5 P(tie)
            order = np.argsort(np.concatenate([neg_scores, pos_scores]), kind="stable")
            ranks = np.empty_like(order, dtype=np.float64)
            ranks[order] = np.arange(len(order))
            pos_ranks = ranks[len(neg_scores):]
            auc = (pos_ranks.sum() - len(pos_scores) * (len(pos_scores) - 1) / 2) / (
                len(pos_scores) * len(neg_scores)
            )
            aucs.append(auc)
        return float(np.mean(aucs))
