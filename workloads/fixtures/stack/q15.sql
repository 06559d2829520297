SELECT COUNT(*) FROM site as s, tag as t, tag_question as tq, question as q, so_user as u
WHERE t.site_id = s.site_id AND tq.tag_id = t.id AND tq.site_id = s.site_id
  AND tq.question_id = q.id AND q.site_id = s.site_id
  AND q.owner_user_id = u.id AND u.site_id = s.site_id
  AND s.site_name = 'math' AND t.name IN ('calculus','probability')
  AND u.reputation >= 100;
