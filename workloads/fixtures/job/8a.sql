SELECT MIN(an.name) AS actress_pseudonym, MIN(t.title) AS japanese_movie_dubbed
FROM aka_name an, cast_info ci, company_name cn, movie_companies mc, name n, role_type rt, title t
WHERE ci.note = '(voice: English version)' AND cn.country_code = '[jp]'
  AND mc.note LIKE '%(Japan)%' AND mc.note NOT LIKE '%(USA)%'
  AND n.name LIKE '%Yo%' AND n.name NOT LIKE '%Yu%' AND rt.role = 'actress'
  AND an.person_id = n.id AND n.id = ci.person_id AND ci.movie_id = t.id
  AND t.id = mc.movie_id AND mc.company_id = cn.id AND ci.role_id = rt.id
  AND an.person_id = ci.person_id AND ci.movie_id = mc.movie_id;
