#!/usr/bin/env node
/**
 * Golden-oracle harness: runs the READ-ONLY reference implementation at
 * /root/reference on JSON inputs from stdin, writes JSON results to stdout.
 * Used ONLY to generate/refresh frozen golden fixtures under tests/golden/
 * (the engine itself never calls node).
 *
 * stdin:  {"op": "...", "cases": [ ... ]}
 *   op = parseServices   case = {doc, depara}
 *   op = parseDocument   case = {docs, depara}
 *   op = normalizeUnidade case = {unidade, listaUnidades}
 *   op = detectTipoCertidao case = {texto, listaTipos}
 *   op = mapBySigla      case = {valor, lista}
 *   op = normalizers     case = {fn, input}
 * stdout: {"results": [ ... ]}
 */
"use strict";

// Shim the `openai` dependency so parser/parseDocument.js can load without
// network/credentials; its GPT call then takes the reference's own error
// path (gpt/extractHeader.js catch → all-null header), which is the
// de-facto production behavior (see ANALISE_PROJETO.md:43-66).
const Module = require("module");
const origLoad = Module._load;
Module._load = function (request, parent, isMain) {
  if (request === "openai") {
    return class OpenAI {
      constructor() {}
      get responses() {
        return { create: async () => { throw new Error("offline-oracle"); } };
      }
    };
  }
  return origLoad.apply(this, arguments);
};
process.env.OPENAI_API_KEY = process.env.OPENAI_API_KEY || "offline-oracle";

const REF = "/root/reference";
const { parseServices } = require(`${REF}/parser/parseServices.js`);
const { parseDocument } = require(`${REF}/parser/parseDocument.js`);
const { normalizeUnidade } = require(`${REF}/parser/normalizeUnidade.js`);
const { detectTipoCertidao } = require(`${REF}/parser/detectTipoCertidao.js`);
const { mapBySigla } = require(`${REF}/parser/mapBySigla.js`);
const { normalizeDepara, mapByTexto } = require(`${REF}/parser/normalizeDepara.js`);

// silence the reference's console noise so stdout stays pure JSON
console.log = () => {};
console.error = () => {};

const chunks = [];
process.stdin.on("data", (c) => chunks.push(c));
process.stdin.on("end", async () => {
  const { op, cases } = JSON.parse(Buffer.concat(chunks).toString("utf8"));
  const results = [];
  for (const c of cases) {
    try {
      let r;
      switch (op) {
        case "parseServices":
          r = parseServices(c.doc, c.depara);
          break;
        case "parseDocument":
          r = await parseDocument(c.docs, c.depara);
          break;
        case "normalizeUnidade":
          r = normalizeUnidade(c.unidade, c.listaUnidades);
          break;
        case "detectTipoCertidao":
          r = detectTipoCertidao(c.texto, c.listaTipos);
          break;
        case "mapBySigla":
          r = mapBySigla(c.valor, c.lista);
          break;
        case "mapByTexto":
          r = mapByTexto(c.texto, c.lista);
          break;
        case "normalizeDepara":
          r = normalizeDepara(c.lista, c.campo);
          break;
        default:
          throw new Error(`unknown op ${op}`);
      }
      results.push(r === undefined ? null : r);
    } catch (e) {
      results.push({ __error__: String(e && e.message) });
    }
  }
  process.stdout.write(JSON.stringify({ results }));
});
