SELECT COUNT(*) FROM users as u, badges as b, comments as c WHERE b.UserId = u.Id AND c.UserId = u.Id AND u.UpVotes>=27 AND u.DownVotes>=4;
