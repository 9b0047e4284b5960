"""Independent PyTorch implementation of the Chimera-ST forward semantics,
used as a golden reference for the checkpoint importer and flax model.

Written from the documented behavior of the reference
(fairseq/models/chimera/w2v2_transformer_interlingua.py,
fairseq/models/wav2vec/wav2vec2.py, fairseq/models/transformer.py) — NOT a
copy; structured so state_dict() keys match fairseq naming, which is exactly
what the importer consumes.
"""

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


class MHA(nn.Module):
    def __init__(self, d, h):
        super().__init__()
        self.d, self.h = d, h
        self.q_proj = nn.Linear(d, d)
        self.k_proj = nn.Linear(d, d)
        self.v_proj = nn.Linear(d, d)
        self.out_proj = nn.Linear(d, d)

    def forward(self, q, k, v, key_padding_mask=None, attn_mask=None, causal=False):
        # q,k,v: [B, T, d]
        B, Tq, _ = q.shape
        Tk = k.shape[1]
        hd = self.d // self.h
        qq = self.q_proj(q).view(B, Tq, self.h, hd).transpose(1, 2)
        kk = self.k_proj(k).view(B, Tk, self.h, hd).transpose(1, 2)
        vv = self.v_proj(v).view(B, Tk, self.h, hd).transpose(1, 2)
        logits = torch.einsum("bhqd,bhkd->bhqk", qq, kk) * hd**-0.5
        if attn_mask is not None:
            logits = logits + attn_mask
        if causal:
            mask = torch.triu(torch.ones(Tq, Tk), 1).bool()
            logits = logits.masked_fill(mask, -1e8)
        if key_padding_mask is not None:
            logits = logits.masked_fill(
                key_padding_mask[:, None, None, :], -1e8
            )
        p = logits.softmax(-1)
        out = torch.einsum("bhqk,bhkd->bhqd", p, vv)
        return self.out_proj(out.transpose(1, 2).reshape(B, Tq, self.d))


class EncLayer(nn.Module):
    """Pre/post-LN encoder layer, fairseq key naming."""

    def __init__(self, d, ffn, h, pre_ln=True, act="relu"):
        super().__init__()
        self.self_attn = MHA(d, h)
        self.self_attn_layer_norm = nn.LayerNorm(d)
        self.fc1 = nn.Linear(d, ffn)
        self.fc2 = nn.Linear(ffn, d)
        self.final_layer_norm = nn.LayerNorm(d)
        self.pre_ln = pre_ln
        self.act = F.relu if act == "relu" else F.gelu

    def forward(self, x, key_padding_mask=None, attn_mask=None):
        r = x
        if self.pre_ln:
            x = self.self_attn_layer_norm(x)
        x = self.self_attn(x, x, x, key_padding_mask, attn_mask)
        x = r + x
        if not self.pre_ln:
            x = self.self_attn_layer_norm(x)
        r = x
        if self.pre_ln:
            x = self.final_layer_norm(x)
        x = self.fc2(self.act(self.fc1(x)))
        x = r + x
        if not self.pre_ln:
            x = self.final_layer_norm(x)
        return x


class DecLayer(nn.Module):
    def __init__(self, d, ffn, h):
        super().__init__()
        self.self_attn = MHA(d, h)
        self.self_attn_layer_norm = nn.LayerNorm(d)
        self.encoder_attn = MHA(d, h)
        self.encoder_attn_layer_norm = nn.LayerNorm(d)
        self.fc1 = nn.Linear(d, ffn)
        self.fc2 = nn.Linear(ffn, d)
        self.final_layer_norm = nn.LayerNorm(d)

    def forward(self, x, enc, enc_mask=None, self_pad_mask=None):
        r = x
        x = self.self_attn_layer_norm(x)
        x = self.self_attn(x, x, x, key_padding_mask=self_pad_mask, causal=True)
        x = r + x
        r = x
        x = self.encoder_attn_layer_norm(x)
        x = self.encoder_attn(x, enc, enc, key_padding_mask=enc_mask)
        x = r + x
        r = x
        x = self.final_layer_norm(x)
        x = self.fc2(F.relu(self.fc1(x)))
        return r + x


def sin_positions(T, d, pad_idx=1):
    half = d // 2
    emb = torch.exp(torch.arange(half).float() * -(math.log(10000.0) / (half - 1)))
    n = T + pad_idx + 1
    ang = torch.arange(n).float()[:, None] * emb[None, :]
    table = torch.cat([ang.sin(), ang.cos()], dim=1)
    table[pad_idx] = 0
    return table


class TorchW2V2(nn.Module):
    """wav2vec2-base-style trunk (extract_features path), fairseq key naming."""

    def __init__(self, conv_spec, d, ffn, layers, heads, conv_pos=8, conv_pos_groups=4):
        super().__init__()
        blocks = []
        in_c = 1
        for i, (c, k, s) in enumerate(conv_spec):
            conv = nn.Conv1d(in_c, c, k, stride=s, bias=False)
            if i == 0:
                block = nn.Sequential(conv, nn.Dropout(0), nn.GroupNorm(c, c), nn.GELU())
            else:
                block = nn.Sequential(conv, nn.Dropout(0), nn.GELU())
            blocks.append(block)
            in_c = c
        self.feature_extractor = nn.Module()
        self.feature_extractor.conv_layers = nn.ModuleList(blocks)
        feat_d = conv_spec[-1][0]
        self.layer_norm = nn.LayerNorm(feat_d)
        # reference: proj only when extractor dim != encoder dim (wav2vec2.py:314-318)
        self.post_extract_proj = nn.Linear(feat_d, d) if feat_d != d else None
        self.encoder = nn.Module()
        pc = nn.Conv1d(d, d, conv_pos, padding=conv_pos // 2, groups=conv_pos_groups)
        pc = nn.utils.weight_norm(pc, name="weight", dim=2)
        self.encoder.pos_conv = nn.ModuleList([pc])
        self.encoder.layers = nn.ModuleList(
            [EncLayer(d, ffn, heads, pre_ln=False, act="gelu") for _ in range(layers)]
        )
        self.encoder.layer_norm = nn.LayerNorm(d)
        self.conv_pos = conv_pos

    def extract_features(self, source, padding_mask):
        x = source.unsqueeze(1)
        for block in self.feature_extractor.conv_layers:
            x = block(x)
        feats = x.transpose(1, 2)  # [B, T', C]
        feats = self.layer_norm(feats)

        if padding_mask is not None:
            extra = padding_mask.size(1) % feats.size(1)
            if extra > 0:
                padding_mask = padding_mask[:, :-extra]
            padding_mask = padding_mask.view(padding_mask.size(0), feats.size(1), -1)
            padding_mask = padding_mask.all(-1)

        if self.post_extract_proj is not None:
            feats = self.post_extract_proj(feats)
        x = feats
        if padding_mask is not None:
            x = x.masked_fill(padding_mask.unsqueeze(-1), 0.0)
        pc = self.encoder.pos_conv[0](x.transpose(1, 2))
        if self.conv_pos % 2 == 0:
            pc = pc[:, :, :-1]
        x = x + F.gelu(pc).transpose(1, 2)
        x = self.encoder.layer_norm(x)
        for layer in self.encoder.layers:
            x = layer(x, key_padding_mask=padding_mask)
        return x, padding_mask


class TorchChimera(nn.Module):
    """Full interlingua model forward, fairseq state-dict naming."""

    def __init__(self, cfg):
        super().__init__()
        c = cfg
        self.cfg = c
        self.encoder = nn.Module()
        enc = self.encoder
        enc.wav2vec_model = TorchW2V2(
            c.w2v2_conv_spec, c.w2v2_embed_dim, c.w2v2_ffn_dim,
            c.w2v2_layers, c.w2v2_heads, c.w2v2_conv_pos, c.w2v2_conv_pos_groups,
        )
        sub_layers = []
        n = len(c.conv_kernel_sizes)
        in_ch = c.w2v2_embed_dim
        for i, k in enumerate(c.conv_kernel_sizes):
            out_ch = c.conv_channels if i < n - 1 else c.encoder_embed_dim * 2
            sub_layers.append(nn.Conv1d(in_ch, out_ch, k, stride=2, padding=k // 2))
            in_ch = out_ch // 2
        enc.subsample = nn.Module()
        enc.subsample.conv_layers = nn.ModuleList(sub_layers)
        if c.src_vocab_size:
            enc.text_embed_tokens = nn.Embedding(c.src_vocab_size, c.encoder_embed_dim, 1)
        enc.transformer_layers = nn.ModuleList(
            [EncLayer(c.encoder_embed_dim, c.encoder_ffn_dim, c.encoder_heads)
             for _ in range(c.encoder_layers)]
        )
        enc.layer_norm = nn.LayerNorm(c.encoder_embed_dim)
        enc.interlingua_embedding = nn.Embedding(c.interlingua_length, c.encoder_embed_dim, 0)
        enc.interlingua_layers = nn.ModuleList(
            [EncLayer(c.encoder_embed_dim, c.encoder_ffn_dim, c.encoder_heads)
             for _ in range(c.interlingua_layers)]
        )
        self.decoder = nn.Module()
        dec = self.decoder
        dec.embed_tokens = nn.Embedding(c.tgt_vocab_size, c.decoder_embed_dim, 1)
        dec.layers = nn.ModuleList(
            [DecLayer(c.decoder_embed_dim, c.decoder_ffn_dim, c.decoder_heads)
             for _ in range(c.decoder_layers)]
        )
        dec.layer_norm = nn.LayerNorm(c.decoder_embed_dim)
        self.scale = math.sqrt(c.encoder_embed_dim)

    def encode_audio(self, wav, padding_mask):
        c = self.cfg
        feats, mask = self.encoder.wav2vec_model.extract_features(wav, padding_mask)
        lengths = (~mask).long().sum(-1) if mask is not None else None
        x = feats.transpose(1, 2)
        for conv in self.encoder.subsample.conv_layers:
            x = F.glu(conv(x), dim=1)
        x = x.transpose(1, 2)  # [B, T, C]
        out_len = x.size(1)
        if lengths is not None:
            for _ in c.conv_kernel_sizes:
                lengths = torch.div(lengths - 1, 2, rounding_mode="floor") + 1
            pad = torch.arange(out_len)[None, :] >= lengths[:, None]
        else:
            pad = torch.zeros(x.size(0), out_len, dtype=torch.bool)
        return self._shared(x, pad, is_text=False)

    def encode_text(self, tokens):
        pad = tokens.eq(1)
        x = self.encoder.text_embed_tokens(tokens)
        return self._shared(x, pad, is_text=True)

    def _shared(self, feat, pad_mask, is_text):
        c = self.cfg
        x = self.scale * feat
        if is_text:
            nonpad = ~pad_mask
            pos_ids = torch.cumsum(nonpad.long(), 1) * nonpad.long() + 1
            table = sin_positions(x.size(1), c.encoder_embed_dim)
            x = x + table[pos_ids]
        for layer in self.encoder.transformer_layers:
            x = layer(x, key_padding_mask=pad_mask)
        x = self.encoder.layer_norm(x)

        B, T, d = x.shape
        M = c.interlingua_length
        mem = self.encoder.interlingua_embedding.weight.unsqueeze(0).repeat(B, 1, 1)
        # reference formulation: concat self-attn, cols [T:] masked by -1e8,
        # NO padding mask (the quirk), keep last M rows
        attn_mask = torch.zeros(T + M, T + M)
        attn_mask[:, T:] = -1e8
        for layer in self.encoder.interlingua_layers:
            y = torch.cat([x, mem], dim=1)
            y = layer(y, key_padding_mask=None, attn_mask=attn_mask)
            mem = y[:, T:]
        return mem

    def decode(self, prev_tokens, enc):
        c = self.cfg
        pad = prev_tokens.eq(1)
        x = self.scale * self.decoder.embed_tokens(prev_tokens)
        nonpad = ~pad
        pos_ids = torch.cumsum(nonpad.long(), 1) * nonpad.long() + 1
        table = sin_positions(x.size(1), c.decoder_embed_dim)
        x = x + table[pos_ids]
        for layer in self.decoder.layers:
            x = layer(x, enc, enc_mask=None, self_pad_mask=pad)
        x = self.decoder.layer_norm(x)
        return F.linear(x, self.decoder.embed_tokens.weight)

    def forward_audio(self, wav, padding_mask, prev_tokens):
        mem = self.encode_audio(wav, padding_mask)
        return self.decode(prev_tokens, mem), mem

    def forward_text(self, tokens, prev_tokens):
        mem = self.encode_text(tokens)
        return self.decode(prev_tokens, mem), mem


class TorchWav2VecCtc(nn.Module):
    """wav2vec 2.0 CTC fine-tune model, fairseq key naming
    (wav2vec2_asr.py:146-184: w2v_encoder.w2v_model + w2v_encoder.proj; the
    trunk keeps mask_emb for train-time span masking)."""

    def __init__(self, conv_spec, d, ffn, layers, heads, vocab,
                 conv_pos=8, conv_pos_groups=4):
        super().__init__()
        self.w2v_encoder = nn.Module()
        e = self.w2v_encoder
        e.w2v_model = TorchW2V2(conv_spec, d, ffn, layers, heads,
                                conv_pos, conv_pos_groups)
        e.w2v_model.mask_emb = nn.Parameter(torch.FloatTensor(d).uniform_())
        e.proj = nn.Linear(d, vocab)

    def forward(self, wav, padding_mask):
        x, mask = self.w2v_encoder.w2v_model.extract_features(wav, padding_mask)
        return self.w2v_encoder.proj(x), mask


class TorchWav2VecSeq2Seq(nn.Module):
    """wav2vec 2.0 seq2seq fine-tune model, fairseq key naming
    (wav2vec2_asr.py:186-302: encoder.w2v_model + encoder.proj dim bridge +
    decoder with untied embed_out). Decoder mirrors TorchChimera.decode
    (pre-LN layers + final layer_norm + sinusoidal positions)."""

    def __init__(self, conv_spec, d, ffn, layers, heads, vocab,
                 dec_d, dec_ffn, dec_layers, dec_heads,
                 conv_pos=8, conv_pos_groups=4):
        super().__init__()
        self.encoder = nn.Module()
        e = self.encoder
        e.w2v_model = TorchW2V2(conv_spec, d, ffn, layers, heads,
                                conv_pos, conv_pos_groups)
        e.w2v_model.mask_emb = nn.Parameter(torch.FloatTensor(d).uniform_())
        e.proj = nn.Linear(d, dec_d)
        self.decoder = nn.Module()
        dec = self.decoder
        dec.embed_tokens = nn.Embedding(vocab, dec_d, 1)
        dec.layers = nn.ModuleList(
            [DecLayer(dec_d, dec_ffn, dec_heads) for _ in range(dec_layers)]
        )
        dec.layer_norm = nn.LayerNorm(dec_d)
        dec.embed_out = nn.Parameter(torch.FloatTensor(vocab, dec_d).uniform_(-0.1, 0.1))
        self.dec_d = dec_d

    def encode(self, wav, padding_mask):
        x, mask = self.encoder.w2v_model.extract_features(wav, padding_mask)
        return self.encoder.proj(x), mask

    def forward(self, wav, padding_mask, prev_tokens):
        enc, enc_mask = self.encode(wav, padding_mask)
        pad = prev_tokens.eq(1)
        x = math.sqrt(self.dec_d) * self.decoder.embed_tokens(prev_tokens)
        nonpad = ~pad
        pos_ids = torch.cumsum(nonpad.long(), 1) * nonpad.long() + 1
        x = x + sin_positions(x.size(1), self.dec_d)[pos_ids]
        for layer in self.decoder.layers:
            x = layer(x, enc, enc_mask=enc_mask, self_pad_mask=pad)
        x = self.decoder.layer_norm(x)
        return F.linear(x, self.decoder.embed_out)
