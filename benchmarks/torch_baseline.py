"""Reference-style PyTorch baseline for bench.py.

A fresh torch implementation of the reference's eval hot path
(models/ynet.py:170-215,398-471 + utils/evaluate.py:109-266): host-side
template slicing (get_patch), VGG-style encoder, two U-Net decoders, and a
sequential per-sample K-goal loop. Used only to compute the `vs_baseline`
ratio on this machine (torch is CPU-only in this environment; the reference
itself published no throughput numbers — BASELINE.md)."""

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


class Encoder(nn.Module):
    def __init__(self, in_ch, chans):
        super().__init__()
        self.stages = nn.ModuleList()
        self.stages.append(nn.Sequential(
            nn.Conv2d(in_ch, chans[0], 3, padding=1), nn.ReLU()))
        for i in range(len(chans) - 1):
            self.stages.append(nn.Sequential(
                nn.MaxPool2d(2, 2),
                nn.Conv2d(chans[i], chans[i + 1], 3, padding=1), nn.ReLU(),
                nn.Conv2d(chans[i + 1], chans[i + 1], 3, padding=1),
                nn.ReLU()))
        self.stages.append(nn.Sequential(nn.MaxPool2d(2, 2)))

    def forward(self, x):
        feats = []
        for s in self.stages:
            x = s(x)
            feats.append(x)
        return feats


class Decoder(nn.Module):
    def __init__(self, enc_chans, dec_chans, out_len, traj=False):
        super().__init__()
        if traj:
            enc_chans = [c + traj for c in enc_chans]
        enc_chans = enc_chans[::-1]
        center = enc_chans[0]
        self.center = nn.Sequential(
            nn.Conv2d(center, center * 2, 3, padding=1), nn.ReLU(),
            nn.Conv2d(center * 2, center * 2, 3, padding=1), nn.ReLU())
        up_in = [center * 2] + list(dec_chans[:-1])
        up_out = [c // 2 for c in up_in]
        self.upsample_conv = nn.ModuleList(
            [nn.Conv2d(i, o, 3, padding=1) for i, o in zip(up_in, up_out)])
        blk_in = [e + u for e, u in zip(enc_chans, up_out)]
        self.decoder = nn.ModuleList([
            nn.Sequential(nn.Conv2d(i, o, 3, padding=1), nn.ReLU(),
                          nn.Conv2d(o, o, 3, padding=1), nn.ReLU())
            for i, o in zip(blk_in, dec_chans)])
        self.predictor = nn.Conv2d(dec_chans[-1], out_len, 1)

    def forward(self, features):
        features = features[::-1]
        x = self.center(features[0])
        for f, d, up in zip(features[1:], self.decoder, self.upsample_conv):
            x = F.interpolate(x, scale_factor=2, mode="bilinear",
                              align_corners=False)
            x = up(x)
            x = torch.cat([x, f], dim=1)
            x = d(x)
        return self.predictor(x)


def get_patch(template, traj, H, W):
    """Host-side template slicing, as the reference does per batch
    (utils/image_utils.py:40-63)."""
    traj = np.asarray(traj)
    x = np.round(traj[:, 0]).astype(int)
    y = np.round(traj[:, 1]).astype(int)
    x_low = template.shape[1] // 2 - x
    y_low = template.shape[0] // 2 - y
    return torch.stack([
        template[yl:yl + H, xl:xl + W] for xl, yl in zip(x_low, y_low)])


def softargmax(t):
    b, c, h, w = t.shape
    flat = t.reshape(b, c, -1)
    p = torch.softmax(flat, dim=-1)
    xs = torch.arange(w).float()
    ys = torch.arange(h).float()
    px = (p.reshape(b, c, h, w).sum(2) * xs).sum(-1)
    py = (p.reshape(b, c, h, w).sum(3) * ys).sum(-1)
    return torch.stack([px, py], -1)


@torch.no_grad()
def eval_iteration(enc, goal_dec, traj_dec, template, semantic, trajs,
                   obs_len, waypoints, n_goal, temperature=1.0):
    """One reference-style eval pass over one scene batch. Returns n_traj."""
    B, total_len, _ = trajs.shape
    H, W = semantic.shape[-2:]
    obs = trajs[:, :obs_len].reshape(-1, 2)
    observed_map = get_patch(template, obs, H, W).reshape(B, obs_len, H, W)
    x = torch.cat([semantic.expand(B, -1, -1, -1), observed_map], dim=1)
    feats = enc(x)
    goal_map = goal_dec(feats)
    wp_map = goal_map[:, waypoints]
    wp_sig = torch.sigmoid(wp_map / temperature)
    prob = wp_sig[:, -1:].reshape(B, -1)
    idx = torch.multinomial(prob, n_goal)
    gx = (idx % W).float()
    gy = torch.div(idx, W, rounding_mode="floor").float()
    goals = torch.stack([gx, gy], -1)  # (B, K, 2)
    for k in range(n_goal):  # sequential per-sample loop (evaluate.py:248)
        wp = goals[:, k].numpy()
        wmap = get_patch(template, wp, H, W).reshape(B, len(waypoints), H, W)
        pyr = [wmap] + [nn.AvgPool2d(2**i, 2**i)(wmap)
                        for i in range(1, len(feats))]
        traj_in = [torch.cat([f, w], dim=1) for f, w in zip(feats, pyr)]
        tm = traj_dec(traj_in)
        softargmax(tm)
    return B


@torch.no_grad()
def train_iteration(enc, goal_dec, traj_dec, opt, criterion, gt_template,
                    template, semantic, trajs, obs_len, waypoints):
    with torch.enable_grad():
        B, total_len, _ = trajs.shape
        H, W = semantic.shape[-2:]
        obs = trajs[:, :obs_len].reshape(-1, 2)
        observed_map = get_patch(template, obs, H, W).reshape(
            B, obs_len, H, W)
        gt_future = trajs[:, obs_len:]
        gt_map = get_patch(gt_template, gt_future.reshape(-1, 2), H,
                           W).reshape(B, -1, H, W)
        wp = gt_future[:, waypoints].reshape(-1, 2)
        wp_map = get_patch(template, wp, H, W).reshape(
            B, len(waypoints), H, W)
        x = torch.cat([semantic.expand(B, -1, -1, -1), observed_map], dim=1)
        feats = enc(x)
        goal_logits = goal_dec(feats)
        pyr = [wp_map] + [nn.AvgPool2d(2**i, 2**i)(wp_map)
                          for i in range(1, len(feats))]
        traj_in = [torch.cat([f, w], dim=1) for f, w in zip(feats, pyr)]
        traj_logits = traj_dec(traj_in)
        loss = (criterion(goal_logits, gt_map)
                + criterion(traj_logits, gt_map)) * 1000
        opt.zero_grad()
        loss.backward()
        opt.step()
    return B


def build(obs_len, pred_len, n_sem, enc_chans, dec_chans, n_wp):
    enc = Encoder(n_sem + obs_len, enc_chans).eval()
    goal_dec = Decoder(enc_chans, dec_chans, pred_len).eval()
    traj_dec = Decoder(enc_chans, dec_chans, pred_len, traj=n_wp).eval()
    return enc, goal_dec, traj_dec
