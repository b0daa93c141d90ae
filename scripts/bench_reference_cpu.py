"""Measure the PyTorch reference's training throughput on this host's CPU.

The reference publishes no benchmark numbers (BASELINE.md), so this script
times a faithful torch rendition of the reference's echoed-speech training
step at the exact reference scale (train_echoed_speech.py:21-31: B=64,
201x500 spectrograms; composite of the two pretrained VQ-VAEs per
echoed_speech_model.py with the train_speech.py/train_rir.py model configs).
The number it prints seeds BASELINE.md and bench.py's ``vs_baseline``.

Implementation note: this is a from-the-equations rendition (tied residual
stacks, VQ argmin + STE, latent pad/concat + fresh decoder, Adam on the
decoder), not an import of the reference code.
"""

import json
import time

import torch
import torch.nn.functional as F


class Residual(torch.nn.Module):
    def __init__(self, ch, hid, res_hid):
        super().__init__()
        self.c1 = torch.nn.Conv1d(ch, res_hid, 3, padding=1, bias=False)
        self.c2 = torch.nn.Conv1d(res_hid, hid, 1, bias=False)

    def forward(self, x):
        return x + self.c2(torch.relu(self.c1(torch.relu(x))))


class Stack(torch.nn.Module):
    def __init__(self, ch, hid, res_hid, n):
        super().__init__()
        self.block = Residual(ch, hid, res_hid)  # tied weights (list-multiply quirk)
        self.n = n

    def forward(self, x):
        for _ in range(self.n):
            x = self.block(x)
        return torch.relu(x)


class Encoder(torch.nn.Module):
    def __init__(self, cin, hid, res_hid, n):
        super().__init__()
        self.conv = torch.nn.Conv1d(cin, hid, 3, padding=1)
        self.stack = Stack(hid, hid, res_hid, n)

    def forward(self, x):
        x1 = self.conv(x)
        return self.stack(x1) + x1


class Decoder(torch.nn.Module):
    def __init__(self, cin, cout, hid, res_hid, n):
        super().__init__()
        self.conv = torch.nn.Conv1d(cin, hid, 3, padding=1)
        self.stack = Stack(hid, hid, res_hid, n)
        self.t1 = torch.nn.ConvTranspose1d(hid, hid, 3, padding=1)
        self.t2 = torch.nn.ConvTranspose1d(hid, hid, 3, padding=1)
        self.t3 = torch.nn.ConvTranspose1d(hid, cout, 3, padding=1)

    def forward(self, x):
        x = self.stack(self.conv(x))
        return self.t3(torch.relu(self.t2(torch.relu(self.t1(x)))))


class VQVAEHalf(torch.nn.Module):
    """Encoder + pre-VQ conv + VQ of the reference ConvolutionalVQVAE."""

    def __init__(self, cin, hid, res_hid, n, dim, k):
        super().__init__()
        self.enc = Encoder(cin, hid, res_hid, n)
        self.pre = torch.nn.Conv1d(hid, dim, 3, padding=1)
        self.codebook = torch.nn.Parameter(torch.rand(k, dim) * 2e-3 - 1e-3)

    def latent(self, x):
        z = self.pre(self.enc(x))  # (B, D, L)
        flat = z.permute(0, 2, 1).reshape(-1, z.shape[1])
        d = (
            flat.pow(2).sum(1, keepdim=True)
            + self.codebook.pow(2).sum(1)
            - 2 * flat @ self.codebook.t()
        )
        idx = d.argmin(1)
        q = self.codebook[idx].reshape(z.shape[0], z.shape[2], z.shape[1]).permute(0, 2, 1)
        return z + (q - z).detach()


def main():
    torch.manual_seed(0)
    B, Fq, T = 64, 201, 500
    speech = VQVAEHalf(Fq, 1024, 1024, 3, 128, 1024)
    rir = VQVAEHalf(T, 1024, 64, 2, 64, 1024)
    decoder = Decoder(128 + 64, Fq, 1024, 1024, 2)
    opt = torch.optim.Adam(decoder.parameters(), lr=1e-3)

    x = torch.randn(B, Fq, T)
    x_rir = x.permute(0, 2, 1).contiguous()

    def step():
        with torch.no_grad():
            sq = speech.latent(x)  # (B, 128, 500)
            rq = rir.latent(x_rir)  # (B, 64, 201)
        rq = F.pad(rq, (0, sq.shape[2] - rq.shape[2]))
        q = torch.cat((sq, rq), dim=1).detach()
        recon = decoder(q)
        loss = F.mse_loss(recon, x)
        opt.zero_grad()
        loss.backward()
        opt.step()
        return float(loss)

    step()  # warmup
    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        step()
    dt = (time.perf_counter() - t0) / iters
    print(
        json.dumps(
            {
                "metric": "reference_cpu_echoed_train_frames_per_sec",
                "value": round(B * T / dt, 1),
                "unit": "frames/s",
                "sec_per_step": round(dt, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
